import time
import jax, jax.numpy as jnp
import numpy as np
a = jnp.ones((256, 768), jnp.float32) * 1.5
b = jnp.ones((256, 768), jnp.float32) * 2.5
c = jnp.ones((256, 768), jnp.float32) * 3.5
float(a.sum())  # force materialize
for name, fn in [
    ("separate np.asarray x3", lambda: (np.asarray(a+0), np.asarray(b+0), np.asarray(c+0))),
    ("jax.device_get list", lambda: jax.device_get([a+0, b+0, c+0])),
]:
    fn()
    t = time.perf_counter()
    for _ in range(5):
        fn()
    print(f"{name}: {(time.perf_counter()-t)/5*1000:.1f} ms", flush=True)
