"""box2d_tpu — a TPU-native 2D rigid-body + particle physics engine in JAX.

A ground-up, TPU-first re-design with the capabilities of Box2D v3 +
LiquidFun (reference: MWstudios/Box2D, C#): `World.step` is a pure function
over fixed-capacity dense arrays — jittable, vmappable over thousands of
independent worlds, and shardable over device meshes for RL-scale batch
simulation.
"""

__version__ = "0.1.0"

from . import constants, distance, geometry, manifold, math2d  # noqa: F401
