import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gatling_jax_cache")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(name, fn, out_shape):
    def kern(x_ref, o_ref):
        o_ref[...] = fn(x_ref[...])
    try:
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(jnp.ones((8, 128), jnp.float32))
        out.block_until_ready()
        print(f"{name}: OK")
    except Exception as e:  # noqa
        msg = str(e).split("\n")[0][:100]
        print(f"{name}: FAIL {msg}")

probe("reshape (8,128)->(1024,)", lambda x: x.reshape(1024), (1024,))
probe("reshape (8,128)->(1024,1)", lambda x: x.reshape(1024, 1), (1024, 1))
probe("stack8 of (8,128)->flat", lambda x: jnp.stack(
    [x.reshape(1024)] * 8, axis=-1), (1024, 8))
probe("concat cols (1024,1)x8", lambda x: jnp.concatenate(
    [x.reshape(1024, 1)] * 8, axis=1), (1024, 8))
probe("transpose (8,128)->(128,8)", lambda x: x.T, (128, 8))
probe("concat transposes", lambda x: jnp.concatenate(
    [x[i:i+1].reshape(128, 1) for i in range(8)] * 1, axis=1), (128, 8))
