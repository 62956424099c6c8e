import sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import strawboat_tpu.kernels
from strawboat_tpu.kernels.bitunpack_pallas import bitunpack_pallas_tmajor

b = 16
n_blocks = 1 << 17

def decode(w):
    return bitunpack_pallas_tmajor(w, b)

@jax.jit
def run(wt, n):
    def body(i, carry):
        w, acc = carry
        w = w ^ (acc & jnp.uint32(1))
        out = decode(w)
        return (w, acc + jnp.sum(out, dtype=jnp.uint32))
    _, acc = jax.lax.fori_loop(0, n, body, (wt, jnp.uint32(0)))
    return acc

wt = jax.ShapeDtypeStruct((16, n_blocks * 4), jnp.uint32)
n = jax.ShapeDtypeStruct((), jnp.int64)
run.lower(wt, 3).compile()
print("bench loop compiled+cached for TPU")
