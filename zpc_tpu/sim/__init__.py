"""Simulation pipelines (reference layer 8, SURVEY §2.8)."""

from .mpm import MPMSim, MPMState, make_mpm_state, explicit_step
from .mpm_binned import BinnedConfig, explicit_step_binned
from .mpm_binned2 import (BinnedConfig2, rollout_binned2,
                          explicit_step_binned2)
from .implicit import implicit_step
from .fluid import make_fluid_state, explicit_fluid_step
from .fluid_binned2 import (bin_fluid_state, explicit_fluid_step_binned2,
                            rollout_fluid_binned2, unbin_fluid_state)
from .scene import Scene
from .runner import simulate
from .cloth import (ClothSim, make_cloth_grid, cloth_energy,
                    implicit_step as cloth_implicit_step)
from .fem import (FemSim, make_tet_box, fem_energy,
                  implicit_step as fem_implicit_step)
