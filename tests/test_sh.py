"""SH eval vs scipy sph_harm oracle."""

import jax.numpy as jnp
import numpy as np

from ht3dgs.core import sh as sh_lib


def real_sh_scipy(l, m, dirs):
    """Real SH in the 3DGS basis convention from scipy's complex sph_harm."""
    from scipy.special import sph_harm_y

    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    theta = np.arccos(np.clip(z, -1, 1))  # polar
    phi = np.arctan2(y, x)                # azimuth
    if m > 0:
        out = np.sqrt(2) * (-1) ** m * sph_harm_y(l, m, theta, phi).real
    elif m < 0:
        out = np.sqrt(2) * (-1) ** m * sph_harm_y(l, -m, theta, phi).imag
    else:
        out = sph_harm_y(l, 0, theta, phi).real
    return out


def test_eval_sh_matches_scipy():
    rng = np.random.default_rng(1)
    dirs = rng.standard_normal((64, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    K = 16
    # one-hot through each coefficient to recover basis functions
    for idx in range(K):
        l = int(np.floor(np.sqrt(idx)))
        m = idx - l * l - l
        coeffs = np.zeros((64, K, 3), np.float32)
        coeffs[:, idx, :] = 1.0
        ours = np.asarray(
            sh_lib.eval_sh(3, jnp.asarray(coeffs), jnp.asarray(dirs, dtype=jnp.float32))
        )[:, 0]
        ref = real_sh_scipy(l, m, dirs)
        # the 3DGS convention flips sign for odd m in some bands; compare
        # against the hardcoded-basis sign by allowing a global per-basis sign
        s = np.sign(np.sum(ours * ref)) or 1.0
        np.testing.assert_allclose(ours, s * ref, atol=2e-5,
                                   err_msg=f"l={l} m={m}")


def test_degree_mask():
    m = np.asarray(sh_lib.sh_degree_mask(jnp.asarray(1), 3))
    assert m.tolist() == [1, 1, 1, 1] + [0] * 12
    m = np.asarray(sh_lib.sh_degree_mask(jnp.asarray(3), 3))
    assert m.tolist() == [1] * 16


def test_rgb_sh_roundtrip():
    rng = np.random.default_rng(2)
    rgb = rng.random((10, 3)).astype(np.float32)
    back = np.asarray(sh_lib.sh2rgb(sh_lib.rgb2sh(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, atol=1e-6)


def test_deg0_is_constant():
    dirs = jnp.asarray(np.random.default_rng(3).standard_normal((5, 3)),
                       dtype=jnp.float32)
    coeffs = jnp.ones((5, 16, 3))
    out = np.asarray(sh_lib.eval_sh(0, coeffs, dirs))
    np.testing.assert_allclose(out, sh_lib.C0, atol=1e-6)
