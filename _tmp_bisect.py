import time
import numpy as np
import jax, jax.numpy as jnp
import functools
from mymedialite_tpu.data.arrays import PosOnlyData
from mymedialite_tpu.ops import bpr as bpr_ops

U, I, n, f = 480_000, 17_770, 20_000_000, 40
rng = np.random.default_rng(1)
fb = PosOnlyData(rng.integers(0, U, n).astype(np.int32),
                 rng.integers(0, I, n).astype(np.int32),
                 num_users=U, num_items=I)
sampler, meta = bpr_ops.make_sampler_data(fb)
print("built", flush=True)

def sample_bench(B, NB, trials=None):
    m = dict(meta)
    if trials is not None:
        m["num_neg_trials"] = trials
    @functools.partial(jax.jit, static_argnames=("nb",))
    def sample_only(key, *, nb):
        def step(acc, b):
            u, i, j, w = bpr_ops._sample_triples(
                jax.random.fold_in(key, b), sampler, m, B, 0)
            return acc + jnp.sum(u) + jnp.sum(i) + jnp.sum(j) + \
                jnp.sum(w).astype(jnp.int32), None
        acc, _ = jax.lax.scan(step, jnp.int32(0),
                              jnp.arange(nb, dtype=jnp.int32))
        return acc
    float(sample_only(jax.random.PRNGKey(0), nb=NB))
    t0 = time.time()
    float(sample_only(jax.random.PRNGKey(1), nb=NB))
    dt = time.time() - t0
    print(f"sample B={B} T={trials or meta['num_neg_trials']}: "
          f"{NB*B/dt/1e6:.2f} M/s", flush=True)

def update_bench(B, NB):
    params = dict(
        user_factors=jnp.asarray(0.1*rng.standard_normal((U, f)).astype(np.float32)),
        item_factors=jnp.asarray(0.1*rng.standard_normal((I, f)).astype(np.float32)),
        item_bias=jnp.zeros(I, jnp.float32))
    hp = {k: jnp.float32(v) for k, v in dict(learn_rate=0.05, reg_u=0.0025,
         reg_i=0.0025, reg_j=0.00025, bias_reg=0.0).items()}
    us = jnp.asarray(rng.integers(0, U, (NB, B)).astype(np.int32))
    iss = jnp.asarray(rng.integers(0, I, (NB, B)).astype(np.int32))
    js = jnp.asarray(rng.integers(0, I, (NB, B)).astype(np.int32))
    @jax.jit
    def update_only(params, us, iss, js):
        def step(p, arrs):
            u, i, j = arrs
            w = jnp.ones(B, jnp.float32)
            wu = p["user_factors"][u]; hi = p["item_factors"][i]; hj = p["item_factors"][j]
            x = p["item_bias"][i] - p["item_bias"][j] + jnp.sum(wu*(hi-hj), -1)
            g = jax.nn.sigmoid(-x) * w
            lr = hp["learn_rate"]
            p["user_factors"] = p["user_factors"].at[u].add(lr*(g[:,None]*(hi-hj) - (w*hp["reg_u"])[:,None]*wu))
            p["item_factors"] = p["item_factors"].at[i].add(lr*(g[:,None]*wu - (w*hp["reg_i"])[:,None]*hi))
            p["item_bias"] = p["item_bias"].at[i].add(lr*(g - hp["bias_reg"]*w*p["item_bias"][i]))
            p["item_factors"] = p["item_factors"].at[j].add(lr*(-g[:,None]*wu - (w*hp["reg_j"])[:,None]*hj))
            p["item_bias"] = p["item_bias"].at[j].add(lr*(-g - hp["bias_reg"]*w*p["item_bias"][j]))
            return p, None
        p, _ = jax.lax.scan(step, params, (us, iss, js))
        return p
    p2 = update_only(dict(params), us, iss, js); float(jnp.sum(p2["item_bias"][:4]))
    t0 = time.time()
    p2 = update_only(dict(params), us, iss, js); float(jnp.sum(p2["item_bias"][:4]))
    dt = time.time() - t0
    print(f"update B={B}: {NB*B/dt/1e6:.2f} M/s", flush=True)

sample_bench(8192, 100)
sample_bench(65536, 50)
sample_bench(65536, 50, trials=2)
update_bench(8192, 100)
update_bench(65536, 50)
