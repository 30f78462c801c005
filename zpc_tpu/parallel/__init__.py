"""Execution + communication layer (reference layer 3 + SURVEY §5.8)."""

from . import primitives
from .mesh import make_mesh, shard_leading, replicated, P, Mesh
