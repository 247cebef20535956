"""Device-side synthetic identity data for bench/evidence tools.

Mirrors data/datasets.py::SyntheticPairs' generative model (fixed
uniform[-1,1] template per identity + gaussian noise per sample; the
'masked' twin paints SyntheticPairs' occluder region to -1.0) but draws
ON DEVICE from step-keyed PRNGs: templates upload once, so a long A/B
loop pays no per-step host batch traffic through the relay.

Used by bench_int8_convergence (train-stream + checkpoint eval pairs)
and bench_int8_budget (protocol-delta eval pairs).
"""

from __future__ import annotations

MASK = (slice(60, 100), slice(20, 92))  # SyntheticPairs' occluder region


def occlude(img):
    """Paint the SyntheticPairs mask region (in-place on a jax array)."""
    return img.at[:, MASK[0], MASK[1], :].set(-1.0)


def make_batch_fn(templates, batch: int, n_ids: int, noise: float):
    """Jitted key -> {img_non, img_ocl, label} training batch sampler."""
    import jax
    import jax.numpy as jnp

    noise = jnp.float32(noise)

    @jax.jit
    def make_batch(key):
        kl, kn = jax.random.split(key)
        labels = jax.random.randint(kl, (batch,), 0, n_ids)
        img = templates[labels] + noise * jax.random.normal(
            kn, (batch, 112, 112, 3), jnp.float32)
        return {"img_non": img, "img_ocl": occlude(img), "label": labels}

    return make_batch


def make_eval_pairs(templates, key, n_pairs: int, n_ids: int, noise: float):
    """ocl-1 verification pairs: img1 clean, img2 masked (the rectified
    branch — RecNet's whole point — has to earn its accuracy). Half same-
    identity, half different. Returns (img1, img2, labels) device arrays."""
    import jax
    import jax.numpy as jnp

    def build(key):
        half = n_pairs // 2
        ka, kb, kd, k1, k2 = jax.random.split(key, 5)
        a_same = jax.random.randint(ka, (half,), 0, n_ids)
        a_diff = jax.random.randint(kb, (half,), 0, n_ids)
        b_diff = (a_diff + 1 + jax.random.randint(
            kd, (half,), 0, n_ids - 1)) % n_ids
        i1 = jnp.concatenate([a_same, a_diff])
        i2 = jnp.concatenate([a_same, b_diff])
        lab = jnp.concatenate([jnp.ones(half, jnp.int32),
                               jnp.zeros(half, jnp.int32)])
        nz = jnp.float32(noise)
        img1 = templates[i1] + nz * jax.random.normal(
            k1, (half * 2, 112, 112, 3), jnp.float32)
        img2 = occlude(templates[i2] + nz * jax.random.normal(
            k2, (half * 2, 112, 112, 3), jnp.float32))
        return img1, img2, lab

    return jax.jit(build)(key)
