"""Attribute 512px step time: forward vs backward vs optimizer update."""
import json, time
import jax, jax.numpy as jnp
from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.models.features import (
    compute_targets, initialize_input, total_loss,
)
from style_transfer_visualizer_tpu.engine.optimizers import adam_init, adam_step

from style_transfer_visualizer_tpu.utils.cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()
SIZE = 512
K = 25
params = vgg19.init_random_params(jax.random.key(0))
sl, cl = (0, 5, 10, 19, 28), (21,)
key = jax.random.key(1)
content = jax.random.uniform(key, (1, SIZE, SIZE, 3), jnp.float32)
style = jax.random.uniform(jax.random.fold_in(key, 1), (1, SIZE, SIZE, 3), jnp.float32)
targets = compute_targets(params, style, content, sl, cl)
x0 = initialize_input(content, "random", jax.random.key(2))

def scan_k(fn, carry_init, k=K):
    def wrapped(*args):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, carry_init(*args), None, length=k)
        return out
    return jax.jit(wrapped)

for prec_name in ("high", "default"):
    prec = {"high": jax.lax.Precision.HIGH, "default": None}[prec_name]

    # (a) forward only, chained to stay data-dependent
    def fwd_chain(x):
        loss, _ = total_loss(params, x, targets, 1e5, 1.0, sl, cl, prec)
        return x + loss * 1e-12
    f_a = scan_k(fwd_chain, lambda x: x)

    # (b) forward+backward
    def vag_chain(x):
        (loss, _), g = jax.value_and_grad(
            lambda xx: total_loss(params, xx, targets, 1e5, 1.0, sl, cl, prec),
            has_aux=True)(x)
        return x - g * 1e-12
    f_b = scan_k(vag_chain, lambda x: x)

    # (c) full adam step
    n = x0.size
    def full_chain(carry):
        x, st = carry
        flat = x.reshape(n)
        def vag(f):
            return jax.value_and_grad(
                lambda ff: total_loss(params, ff.reshape(x0.shape), targets,
                                      1e5, 1.0, sl, cl, prec),
                has_aux=True)(f)
        new_flat, new_st, aux = adam_step(vag, flat, st, 0.05)
        return (new_flat.reshape(x0.shape), new_st)
    f_c = jax.jit(lambda x, st: jax.lax.scan(
        lambda c, _: (full_chain(c), None), (x, st), None, length=K)[0])

    results = {}
    for name, f, args in [
        ("forward", f_a, (jnp.array(x0),)),
        ("fwd+bwd", f_b, (jnp.array(x0),)),
        ("full_step", f_c, (jnp.array(x0), adam_init(n))),
    ]:
        out = f(*args); jax.block_until_ready(out)
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = f(*args); jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best / K * 1000, 3)
    print(json.dumps({"precision": prec_name, "ms_per_step": results}), flush=True)
