"""Hardware check: the wide-halves tiled kernel (halves=chunk/w) matches
the XLA solver path on pyramid-140 for a few steps from spawn.

Run on the real chip: `python tools/check_halves_tpu.py [rows] [steps]`.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from box2d_tpu import scenes
from box2d_tpu.world import _step
from box2d_tpu.narrowphase import classes_for_shape_types

rows = int(sys.argv[1]) if len(sys.argv) > 1 else 140
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

w = scenes.pyramid(rows=rows)
w.compile()
state = w.state
cap = w.capacity
classes = w._classes
print("chunk", cap.color_chunk, "pairs cap", cap.max_contact_pairs,
      "pallas mode", w._use_pallas, flush=True)

step_x = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4,
                                 frozenset(), (), True, None, 0))
step_t = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4,
                                 frozenset(), (), True, None, 2))
sx = state
st = state
for i in range(steps):
    sx = step_x(sx)
    st = step_t(st)
    cx = np.asarray(sx.bodies.center)
    ct = np.asarray(st.bodies.center)
    print(f"step {i}: pos maxdiff {np.abs(cx - ct).max():.3e} "
          f"v maxdiff {np.abs(np.asarray(sx.bodies.v) - np.asarray(st.bodies.v)).max():.3e}",
          flush=True)
print("OK", flush=True)
