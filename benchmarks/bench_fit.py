"""Step-1-style fit of the implicit net to the analytic blobby union."""
import numpy as np


def fit(model, params, centers, radii, n_fit=800, fit_bs=8192, seed=11):
    import jax
    import jax.numpy as jnp
    import optax

    def sdf_gt(p):
        d = jnp.linalg.norm(p[:, None, :] - jnp.asarray(centers)[None], axis=-1)
        return (d - jnp.asarray(radii)[None]).min(-1)

    fit_rng = np.random.RandomState(seed)
    k = fit_bs // 2
    ci = fit_rng.randint(0, len(centers), (n_fit, k))
    nd = fit_rng.normal(size=(n_fit, k, 3))
    nd /= np.linalg.norm(nd, axis=-1, keepdims=True)
    near = centers[ci] + nd * (radii[ci][..., None] + fit_rng.normal(scale=0.05, size=(n_fit, k, 1)))
    uni = fit_rng.uniform(-1.0, 1.0, (n_fit, fit_bs - k, 3))
    pts = jnp.asarray(np.concatenate([near, uni], 1), jnp.float32)

    imp = model.implicit_network
    tx = optax.adam(1e-3)

    def step(carry, p):
        pi, st = carry
        g = jax.grad(lambda q: jnp.abs(imp.sdf(q, p) - sdf_gt(p)).mean())(pi)
        u, st = tx.update(g, st, pi)
        return (optax.apply_updates(pi, u), st), None

    pi = params["implicit_network"]
    (pi, _), _ = jax.jit(lambda c, xs: jax.lax.scan(step, c, xs))((pi, tx.init(pi)), pts)
    jax.block_until_ready(pi)
    return dict(params, implicit_network=pi)
