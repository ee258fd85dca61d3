"""Remote-viewer bridge (SIBR network_gui protocol counterpart).

The reference ships a socket bridge for the SIBR interactive viewer
(`/root/reference/gaussian_renderer/network_gui.py:24-84`; never imported by
its training code but part of the upstream API surface). This is the
server side for our framework: it accepts the same JSON-header + raw-matrix
message layout (two little-endian uint32 sizes? — the SIBR client sends a
4-byte JSON length, the JSON, then 4x4 view/projection matrices as f32) and
streams back rendered RGB bytes.

Run: `python -m ht3dgs.cli.viewer --checkpoint output/.../chkpnt/model.npz`
"""

from __future__ import annotations

import argparse
import json
import socket
import struct
import traceback

import numpy as np


def _read_exact(conn, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("client closed")
        buf += chunk
    return buf


def serve(checkpoint: str, host: str = "127.0.0.1", port: int = 6009,
          max_sh_degree: int = 3):
    import jax.numpy as jnp

    from ..core.camera import Camera
    from ..train import step as step_lib
    from ..train.hierarchy import HTGaussianTrainer  # for load format

    z = np.load(checkpoint)
    from ..core import gaussians as G

    state = G.GaussianState(
        **{f: jnp.asarray(z[f]) for f in G.PARAM_FIELDS},
        live=jnp.asarray(z["live"]),
        max_radii2d=jnp.asarray(z["max_radii2d"]),
        grad_accum=jnp.asarray(z["grad_accum"]),
        grad_denom=jnp.asarray(z["grad_denom"]),
        active_sh_degree=jnp.asarray(z["active_sh_degree"]),
        max_sh_degree=int(z["max_sh_degree"]),
    )

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(1)
    print(f"viewer bridge on {host}:{port}")
    while True:
        conn, addr = srv.accept()
        print(f"client {addr}")
        try:
            while True:
                (jlen,) = struct.unpack("<I", _read_exact(conn, 4))
                msg = json.loads(_read_exact(conn, jlen).decode("utf-8"))
                h = int(msg["resolution_y"])
                w = int(msg["resolution_x"])
                if h == 0 or w == 0:
                    continue
                fovy = float(msg["fov_y"])
                fovx = float(msg["fov_x"])
                # znear/zfar ignored (fixed in projection); matrices:
                view = np.frombuffer(_read_exact(conn, 64),
                                     dtype="<f4").reshape(4, 4).T
                _proj = _read_exact(conn, 64)  # full proj (recomputed here)
                from ..core.camera import fov2focal, intrinsics_from_fov

                K = intrinsics_from_fov(fovx, h, w, fovy=fovy)
                from ..core.camera import make_camera

                cam = make_camera(h, w, K, world_view=view)
                out = step_lib.render_eval(state, cam, mode="auto")
                img = np.asarray(out["image"])
                payload = (np.clip(img, 0, 1) * 255).astype(np.uint8).tobytes()
                conn.sendall(struct.pack("<I", len(payload)) + payload)
        except (ConnectionError, json.JSONDecodeError):
            pass
        except Exception:
            traceback.print_exc()
        finally:
            conn.close()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=6009)
    args = p.parse_args()
    serve(args.checkpoint, args.host, args.port)


if __name__ == "__main__":
    main()
