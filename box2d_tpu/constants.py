"""Global tuning constants.

Mirrors the reference engine's tuning values (ref: src/Constants.cs:4-41 and
include/MathFunctions.cs:337). These are plain Python floats baked into the
jitted program as compile-time constants — the TPU analog of the reference's
static fields.
"""

import math

# Unit scale (ref: include/MathFunctions.cs:337)
LENGTH_UNITS_PER_METER = 1.0

# Used to detect bad values (ref: src/Constants.cs:8)
HUGE = 100000.0 * LENGTH_UNITS_PER_METER

# Maximum number of colors in the constraint graph (ref: src/Constants.cs:13).
# Constraints that cannot find a color go to the overflow color which is
# solved with extra relaxation sweeps.
GRAPH_COLOR_COUNT = 24

# Colors reserved for dynamic-vs-dynamic constraints; dynamic-vs-static
# constraints are biased to the tail colors so they are solved last within a
# Gauss-Seidel sweep, reducing push-through (ref: src/Constants.cs:36).
DYNAMIC_COLOR_COUNT = 20

# Collision/constraint tolerance, 0.5 cm (ref: src/Constants.cs:18)
LINEAR_SLOP = 0.005 * LENGTH_UNITS_PER_METER

# Maximum rotation of a body per time step (ref: src/Constants.cs:22)
MAX_ROTATION = 0.25 * math.pi

# Speculative contact distance, 2 cm (ref: src/Constants.cs:26)
SPECULATIVE_DISTANCE = 4.0 * LINEAR_SLOP

# AABB fattening margin, 5 cm (ref: src/Constants.cs:31)
AABB_MARGIN = 0.05 * LENGTH_UNITS_PER_METER

# Time a body must be still before sleeping, seconds (ref: src/Constants.cs:33)
TIME_TO_SLEEP = 0.5

# float32 machine epsilon (ref: include/Box2D.cs FLT_EPSILON usage)
FLT_EPSILON = 1.1920929e-7

# Maximum vertices in a convex polygon (ref: include/Collision.cs MaxPolygonVertices)
MAX_POLYGON_VERTICES = 8

# Default world tuning (ref: include/Types.cs:77-144 WorldDef defaults)
DEFAULT_GRAVITY = (0.0, -10.0)
DEFAULT_RESTITUTION_THRESHOLD = 1.0 * LENGTH_UNITS_PER_METER
DEFAULT_HIT_EVENT_THRESHOLD = 1.0 * LENGTH_UNITS_PER_METER
DEFAULT_CONTACT_HERTZ = 30.0
DEFAULT_CONTACT_DAMPING_RATIO = 10.0
DEFAULT_CONTACT_SPEED = 3.0 * LENGTH_UNITS_PER_METER
DEFAULT_MAX_LINEAR_SPEED = 400.0 * LENGTH_UNITS_PER_METER

# Default joint tuning (ref: include/Types.cs joint def defaults)
DEFAULT_JOINT_HERTZ = 60.0
DEFAULT_JOINT_DAMPING_RATIO = 2.0
