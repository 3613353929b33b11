import jax
import jax.numpy as jnp
import numpy as np
import torch

from myslam_tpu.core.sampling import (
    depth_guided_z_vals,
    perturb_z_vals,
    sample_pdf,
    uniform_z_vals,
)


def torch_sample_pdf(bins, weights, n_samples, u):
    """Reference src/common.py:41-77 with injected uniforms."""
    bins = torch.from_numpy(bins)
    weights = torch.from_numpy(weights)
    u = torch.from_numpy(u)
    pdf = weights  # deliberate: unnormalized (reference quirk)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    inds = torch.searchsorted(cdf, u, right=True)
    below = torch.max(torch.zeros_like(inds - 1), inds - 1)
    above = torch.min((cdf.shape[-1] - 1) * torch.ones_like(inds), inds)
    inds_g = torch.stack([below, above], -1)
    matched_shape = [inds_g.shape[0], inds_g.shape[1], cdf.shape[-1]]
    cdf_g = torch.gather(cdf.unsqueeze(1).expand(matched_shape), 2, inds_g)
    bins_g = torch.gather(bins.unsqueeze(1).expand(matched_shape), 2, inds_g)
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g[..., 0]) / denom
    return (bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])).numpy()


def test_sample_pdf_matches_reference_quirk():
    rng = np.random.default_rng(0)
    n, m = 16, 31  # bins = m, weights = m-1 (as in the renderer call)
    bins = np.sort(rng.uniform(0, 5, size=(n, m)).astype(np.float32), axis=-1)
    weights = rng.uniform(0, 0.2, size=(n, m - 1)).astype(np.float32)
    u = rng.uniform(0, 1, size=(n, 8)).astype(np.float32)

    theirs = torch_sample_pdf(bins, weights, 8, u)
    ours = np.asarray(
        sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins),
                   jnp.asarray(weights), 8, u=jnp.asarray(u))
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_depth_guided_z_vals_structure():
    key = jax.random.PRNGKey(0)
    d = jnp.array([2.0, 3.0])
    z = depth_guided_z_vals(key, d, truncation=0.06, n_stratified=32,
                            n_importance=8, perturb=False)
    assert z.shape == (2, 40)
    z0 = np.asarray(z[0])
    assert np.all(np.diff(z0) >= 0)  # sorted
    # free samples span [0, 1.2 d]; surface span [d-1.5T, d+1.5T]
    np.testing.assert_allclose(z0[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(z0[-1], 1.2 * 2.0, atol=1e-5)
    assert np.any(np.abs(z0 - 2.0) < 0.1)  # samples near surface


def test_uniform_z_vals_range():
    key = jax.random.PRNGKey(0)
    far = jnp.array([4.0])
    z = uniform_z_vals(key, far, 32, perturb=False)
    z0 = np.asarray(z[0])
    np.testing.assert_allclose(z0[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(z0[-1], 4.0, atol=1e-5)


def test_perturb_stays_in_intervals():
    key = jax.random.PRNGKey(3)
    z = jnp.linspace(0.0, 1.0, 16)[None, :].repeat(4, axis=0)
    zp = np.asarray(perturb_z_vals(key, z))
    z0 = np.asarray(z)
    # each sample moves at most to the midpoint of adjacent intervals
    assert np.all(zp >= z0[..., :1])
    assert np.all(zp <= z0[..., -1:])
    assert np.all(np.diff(zp, axis=-1) > -1e-6)
