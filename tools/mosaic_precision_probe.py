import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gatling_jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(x_ref, oh_ref, o_def, o_high):
    o_def[...] = jax.lax.dot_general(
        oh_ref[...], x_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_high[...] = jax.lax.dot_general(
        oh_ref[...], x_ref[...], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)

rng = np.random.default_rng(0)
x = (rng.standard_normal((128, 128)) * 1.001).astype(np.float32)
oh = np.eye(128, dtype=np.float32)  # one-hot rows: output should equal x
od, oh_hi = pl.pallas_call(
    kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_shape=[jax.ShapeDtypeStruct((128, 128), jnp.float32)] * 2,
)(jnp.asarray(x), jnp.asarray(oh))
for name, o in (("DEFAULT", od), ("HIGHEST", oh_hi)):
    err = np.abs(np.asarray(o) - x).max()
    rel = err / np.abs(x).max()
    print(f"one-hot matmul {name}: max abs err {err:.3e} (rel {rel:.3e})")
