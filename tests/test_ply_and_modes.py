"""PLY round-trip, render equivalence after reload, and viewer-bridge
protocol smoke."""

import json
import socket
import struct
import threading

import numpy as np

from ht3dgs.core import gaussians as G
from ht3dgs.core.camera import intrinsics_from_fov, make_camera
from ht3dgs.data import ply as ply_lib
from ht3dgs.raster import render


def make_state(n=64, cap=96, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32) * 0.4
    pts[:, 2] += 3.0
    st = G.create_from_pcd(pts, rng.random((n, 3)).astype(np.float32),
                           capacity=cap)
    import jax.numpy as jnp

    # non-trivial rest coeffs + rotations so the roundtrip is meaningful
    st.sh_rest = jnp.asarray(
        rng.standard_normal(np.asarray(st.sh_rest).shape).astype(np.float32)
        * 0.01)
    q = rng.standard_normal((cap, 4)).astype(np.float32)
    st.quats = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))
    # load_ply activates the full SH degree (reference parity); match it
    st.active_sh_degree = jnp.asarray(3, jnp.int32)
    return st


def test_ply_roundtrip_renders_identically(tmp_path):
    st = make_state()
    path = str(tmp_path / "model.ply")
    ply_lib.save_ply(st, path)
    st2 = ply_lib.load_ply(path, max_sh_degree=3)
    assert int(st2.n_live()) == int(st.n_live())

    cam = make_camera(32, 48, intrinsics_from_fov(1.2, 32, 48))
    img1 = np.asarray(render(st, cam, mode="oracle")["image"])
    img2 = np.asarray(render(st2, cam, mode="oracle")["image"])
    np.testing.assert_allclose(img2, img1, atol=1e-5)


def test_ply_header_is_standard(tmp_path):
    st = make_state(n=8, cap=8)
    path = str(tmp_path / "m.ply")
    ply_lib.save_ply(st, path)
    head = open(path, "rb").read(2000).decode("ascii", errors="ignore")
    for prop in ("f_dc_0", "f_rest_44", "opacity", "scale_2", "rot_3"):
        assert f"property float {prop}" in head
    assert "element vertex 8" in head


def test_viewer_bridge_roundtrip(tmp_path):
    """Start the bridge on a free port, send one SIBR-style request, expect
    an RGB payload of the right size."""
    import jax.numpy as jnp

    from ht3dgs.cli import viewer as viewer_lib

    # build a checkpoint file
    st = make_state()
    arrs = {f: np.asarray(getattr(st, f)) for f in G.PARAM_FIELDS}
    arrs.update(live=np.asarray(st.live),
                max_radii2d=np.asarray(st.max_radii2d),
                grad_accum=np.asarray(st.grad_accum),
                grad_denom=np.asarray(st.grad_denom),
                active_sh_degree=np.asarray(st.active_sh_degree),
                max_sh_degree=np.asarray(3))
    ckpt = str(tmp_path / "model.npz")
    np.savez(ckpt, **arrs)

    # free port
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    t = threading.Thread(target=viewer_lib.serve,
                         args=(ckpt, "127.0.0.1", port), daemon=True)
    t.start()

    import time

    cli = None
    for _ in range(100):
        try:
            cli = socket.create_connection(("127.0.0.1", port), timeout=5)
            break
        except OSError:
            time.sleep(0.2)
    assert cli is not None
    # generous IO timeout: under full-suite load (other workers own the
    # CPUs) the server's first render/compile can take tens of seconds
    cli.settimeout(120)

    msg = json.dumps({"resolution_x": 48, "resolution_y": 32,
                      "fov_x": 1.2, "fov_y": 0.9,
                      "z_near": 0.01, "z_far": 100.0}).encode()
    view = np.eye(4, dtype="<f4")
    cli.sendall(struct.pack("<I", len(msg)) + msg + view.T.tobytes()
                + view.T.tobytes())
    (plen,) = struct.unpack("<I", cli.recv(4))
    assert plen == 32 * 48 * 3
    buf = b""
    while len(buf) < plen:
        buf += cli.recv(plen - len(buf))
    img = np.frombuffer(buf, np.uint8).reshape(32, 48, 3)
    assert img.max() > 0  # something rendered
    cli.close()
