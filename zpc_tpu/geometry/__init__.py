"""Geometry / spatial structures (reference layer 6, SURVEY §2.6)."""

from .levelset import (LevelSet, HalfSpace, Sphere, Cuboid, Cylinder, Torus,
                       TransformedLevelSet, UnionLevelSet,
                       IntersectionLevelSet, ComplementLevelSet)
from .collider import Collider, ColliderType, resolve_boundaries
from .ccd_tight import CCDResult, vertex_face_ccd, edge_edge_ccd_tight
from .marching import TriSoup, marching_tets, surface_from_levelset
from .sparse_grid import SparseGrid, sparse_grid, neighbor_offsets
from .dihedral import (dihedral_angle, dihedral_angle_gradient,
                       dihedral_angle_hessian, hinge_bending_energy,
                       hinge_bending_gradient, hinge_bending_hessian)
