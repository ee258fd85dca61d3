"""Range-partitioned Gaussians: scale the model across chips (3M+).

The reference is bounded by one GPU's memory (SURVEY.md §7.5); here the
Gaussian rows themselves shard across the mesh's `tile` axis — each chip
owns cap/n rows of the parameter/optimizer/stats state, projects and
frustum-culls only its rows, and `all_gather`s the packed survivor rows
(not the raw parameters) into the shared binning + blend stage for its own
row block of the image:

    local project -> local cull-compact (<= cull_cap rows) ->
    all_gather(packed survivors) over ICI -> binning -> Pallas blend ->
    row-block loss (halo'd SSIM) -> AD (gradients re-scatter through the
    all_gather transpose) -> local Adam on the owned rows.

Memory per chip scales as cap/n for the state + n*cull_cap packed rows for
the render working set; `cull_cap` bounds the gathered set (survivors
beyond it drop farthest-first, reported in metrics["n_culled_dropped"]).

Densify/prune run shard-locally (each shard compacts its own rows with its
own key) — identical dynamics to the single-chip path up to which slots
new Gaussians land in.

State layout: a stacked GaussianState with leading axis n_shards
(`shard_state` / `unshard_state`), placed with shard_map specs P("tile").
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core import adam as adam_lib
from ..core.gaussians import GaussianState, PARAM_FIELDS
from ..raster.projection import project
from ..raster.tiled import _pack_attr_rows, rasterize_from_rows
from ..train import densify as densify_lib
from ..train.losses import l1_loss, ssim_sharded
from .mesh import _row_block_camera


def shard_state(state: GaussianState, n_shards: int) -> GaussianState:
    """[cap] arrays -> [n_shards, cap/n] (cap must divide n_shards)."""
    cap = state.capacity
    assert cap % n_shards == 0, (cap, n_shards)

    def split(x):
        return x.reshape((n_shards, cap // n_shards) + x.shape[1:])

    return dataclasses.replace(
        state,
        **{f: split(getattr(state, f)) for f in PARAM_FIELDS},
        live=split(state.live),
        max_radii2d=split(state.max_radii2d),
        grad_accum=split(state.grad_accum),
        grad_denom=split(state.grad_denom),
        active_sh_degree=jnp.broadcast_to(state.active_sh_degree,
                                          (n_shards,)),
    )


def unshard_state(state: GaussianState) -> GaussianState:
    def merge(x):
        return x.reshape((-1,) + x.shape[2:])

    return dataclasses.replace(
        state,
        **{f: merge(getattr(state, f)) for f in PARAM_FIELDS},
        live=merge(state.live),
        max_radii2d=merge(state.max_radii2d),
        grad_accum=merge(state.grad_accum),
        grad_denom=merge(state.grad_denom),
        active_sh_degree=state.active_sh_degree[0],
    )


def shard_opt(opt: adam_lib.AdamState, n_shards: int) -> adam_lib.AdamState:
    def split(x):
        return x.reshape((n_shards, x.shape[0] // n_shards) + x.shape[1:])

    return adam_lib.AdamState(
        m=jax.tree.map(split, opt.m), v=jax.tree.map(split, opt.v),
        step=jnp.broadcast_to(opt.step, (n_shards,)))


def unshard_opt(opt: adam_lib.AdamState) -> adam_lib.AdamState:
    def merge(x):
        return x.reshape((-1,) + x.shape[2:])

    return adam_lib.AdamState(
        m=jax.tree.map(merge, opt.m), v=jax.tree.map(merge, opt.v),
        step=opt.step[0])


def build_gauss_sharded_step(mesh: Mesh, height: int, width: int, *,
                             cull_cap: Optional[int],
                             tile_args: Optional[dict] = None,
                             lambda_dssim: float = 0.2):
    """Train step over a Gaussian-row-sharded model ('tile' axis does double
    duty: Gaussian range partition + image row blocks). Call with the
    stacked [n, cap/n, ...] state/opt from shard_state/shard_opt.

    step(state_sh, opt_sh, camera, gt [H, W, 3], lrs dict of scalars)
      -> (state_sh', opt_sh', metrics)

    cull_cap=None skips the source-side frustum cull-compaction and
    all_gathers the raw packed rows. Combined with a block-sized
    tile_args["compact_n"] (destination-side cull to the chip's row
    block inside the binning, raster.tiled) this is the POD
    configuration: projection/packing divide by n (owned rows only), the
    binning's expansion/fills/tile-sort divide via compact_n, Adam is
    shard-local (NO parameter-gradient collective — the only exchanges
    are the attrs all_gather and its reduce_scatter transpose), and only
    the destination depth co-sort over the gathered rows stays O(N).
    Measured per-chip block step at 1M/1080p/8-way on v5e: 20.3 ms vs
    90.7 single-chip (tools/pod_scaling_probe.py 'routed')."""
    n_sh = mesh.shape["tile"]
    assert height % n_sh == 0, (height, n_sh)
    block_h = height // n_sh
    targs = dict(tile_args or {})

    def per_device(state, opt, camera, gt_block, lrs):
        cap_sh = state.capacity
        probe0 = jnp.zeros((cap_sh, 2), state.means.dtype)
        row0 = (jax.lax.axis_index("tile") * block_h).astype(jnp.float32)

        def loss_fn(params, probe):
            s = state.replace_params(params)
            # project the OWNED rows in the full-image frame (the gathered
            # row table must share one coordinate system across shards)
            proj = project(
                s.means, s.scales(), s.quats, s.opacities(), s.sh(),
                s.live, camera, s.active_sh_degree, s.max_sh_degree)
            # densification-probe in the full-image NDC*(0.5*size) units
            scale = jnp.asarray([0.5 * width, 0.5 * height], jnp.float32)
            proj = proj._replace(means2d=proj.means2d + probe * scale)

            attrs = _pack_attr_rows(proj)
            if cull_cap is not None:
                # local cull-compaction: survivors first (stable), gather
                order = jnp.argsort(~proj.valid, stable=True)[:cull_cap]
                attrs_c = jnp.take(attrs, order, axis=0)
                valid_c = jnp.take(proj.valid, order)
                depth_c = jnp.take(proj.depths, order)  # +inf for invalid
                n_lost = jnp.maximum(
                    jnp.sum(proj.valid.astype(jnp.int32)) - cull_cap, 0)
            else:
                # pod configuration: ship the raw packed rows; the
                # destination block-culls inside the binning (compact_n)
                attrs_c, valid_c, depth_c = attrs, proj.valid, proj.depths
                n_lost = jnp.asarray(0, jnp.int32)

            def ag(x):
                g = jax.lax.all_gather(x, "tile")
                return g.reshape((g.shape[0] * g.shape[1],) + g.shape[2:])

            attrs_g = ag(attrs_c)
            # shift screen-y into this shard's row-block frame
            attrs_g = attrs_g.at[:, 1].add(-row0)
            out = rasterize_from_rows(
                attrs_g, ag(valid_c), ag(depth_c), block_h, width,
                jnp.zeros((3,), jnp.float32), **targs)

            l1 = jax.lax.pmean(l1_loss(out["image"], gt_block), "tile")
            ds = (1.0 - ssim_sharded(out["image"], gt_block, "tile")
                  ) if lambda_dssim else jnp.asarray(0.0)
            loss = (1.0 - lambda_dssim) * l1 + lambda_dssim * ds
            return loss, (out, proj.radii, n_lost)

        (loss, (out, radii, n_lost)), (grads, probe_grad) = \
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                state.params(), probe0)
        # local params reach every shard's loss term through the all_gather,
        # whose transpose accumulates each term's cotangent at FULL weight
        # (psum-of-psum semantics) — n copies of the pmean'd global loss —
        # so the per-shard gradient is n_sh times the true gradient; rescale
        # instead of adding a collective (verified exactly against the
        # single-device step in tests/test_parallel.py)
        grads = jax.tree.map(lambda g: g / n_sh, grads)
        probe_grad = probe_grad / n_sh
        state = densify_lib.accumulate_stats(state, probe_grad, radii)
        new_params, new_opt = adam_lib.apply(state.params(), grads, opt,
                                             lrs)
        mse = jax.lax.pmean(jnp.mean((out["image"] - gt_block) ** 2),
                            "tile")
        metrics = {
            "loss": loss,
            "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-12)),
            "n_dropped": jax.lax.psum(out["n_dropped"], "tile"),
            "n_culled_dropped": jax.lax.psum(n_lost, "tile"),
            "n_dropped_compact": jax.lax.psum(
                out.get("n_dropped_compact", jnp.asarray(0, jnp.int32)),
                "tile"),
        }
        return state.replace_params(new_params), new_opt, metrics

    def spec_tree(tree, spec):
        return jax.tree.map(lambda _: spec, tree)

    from jax import shard_map

    def body(state, opt, camera, gt, lrs):
        s1 = jax.tree.map(lambda x: x[0], state)
        o1 = jax.tree.map(lambda x: x[0], opt)
        ns, no, metrics = per_device(s1, o1, camera, gt, lrs)
        return (jax.tree.map(lambda x: x[None], ns),
                jax.tree.map(lambda x: x[None], no),
                metrics)

    @jax.jit
    def step(state_sh, opt_sh, camera, gt, lrs):
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(
                spec_tree(state_sh, P("tile")),
                spec_tree(opt_sh, P("tile")),
                spec_tree(camera, P()),
                P("tile", None, None),
                spec_tree(lrs, P()),
            ),
            out_specs=(
                spec_tree(state_sh, P("tile")),
                spec_tree(opt_sh, P("tile")),
                {"loss": P(), "psnr": P(), "n_dropped": P(),
                 "n_culled_dropped": P(), "n_dropped_compact": P()},
            ),
            check_vma=False,
        )
        return fn(state_sh, opt_sh, camera, gt, lrs)

    return step


def build_sharded_densify(mesh: Mesh):
    """Shard-local densify_and_prune over the stacked [n, cap/n] state."""
    from jax import shard_map

    def spec_tree(tree, spec):
        return jax.tree.map(lambda _: spec, tree)

    def body(state, opt, key, max_grad, min_op, extent, pdense, mss, use_s):
        s1 = jax.tree.map(lambda x: x[0], state)
        o1 = jax.tree.map(lambda x: x[0], opt)
        k = jax.random.fold_in(key, jax.lax.axis_index("tile"))
        ns, no, dropped = densify_lib.densify_and_prune(
            s1, o1, k, max_grad, min_op, extent, pdense, mss, use_s)
        return (jax.tree.map(lambda x: x[None], ns),
                jax.tree.map(lambda x: x[None], no),
                jax.lax.psum(dropped, "tile"))

    def densify(state_sh, opt_sh, key, max_grad, min_op, extent, pdense,
                mss, use_s):
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(spec_tree(state_sh, P("tile")),
                      spec_tree(opt_sh, P("tile")),
                      P(), P(), P(), P(), P(), P(), P()),
            out_specs=(spec_tree(state_sh, P("tile")),
                       spec_tree(opt_sh, P("tile")), P()),
            check_vma=False,
        )
        return fn(state_sh, opt_sh, key, jnp.asarray(max_grad),
                  jnp.asarray(min_op), jnp.asarray(extent),
                  jnp.asarray(pdense), jnp.asarray(mss),
                  jnp.asarray(use_s))

    return jax.jit(densify)
