"""lpe_tpu: a TPU-native 2D physics simulation framework.

Re-architecture of ``sean-peters-au/little-physics-engine`` (C++/Metal/SFML)
as a JAX/XLA/Pallas framework: SPH fluids with two-way rigid coupling, a
GJK/EPA + PGS rigid-body pipeline, N-body gravity, seven scenarios, headless
on-device renderers, checkpointing, and multi-chip sharding.
"""
from .core import constants
from .core.config import ScenarioSystemConfig
from .core.constants import Phase, ShapeKind, SimulationType
from .scenarios import create_scenario, list_scenarios
from .scene import Scene, SceneBuilder, SceneSpec
from .state import Bodies, SimState
from .systems import build_tick_fn

__version__ = "0.1.0"
__all__ = [
    "constants", "ScenarioSystemConfig", "Phase", "ShapeKind",
    "SimulationType", "create_scenario", "list_scenarios", "Scene",
    "SceneBuilder", "SceneSpec", "Bodies", "SimState", "build_tick_fn",
]
