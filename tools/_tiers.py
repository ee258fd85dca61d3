"""Shared photo-plane benchmark tier configs (real_image_bench,
e2e_diagnose).

One place for the quick/medium/full tier settings so the bench and its
stage-level diagnostic always run the same configuration.

Schedule-scale note: the reference's derived schedule
(opacity_reset_interval = num_iterations//10,
/root/reference/trainer/ht3dgs_trainer.py:678) is calibrated for
seq_len ~300 x single_step 300, where a leaf model never sees an opacity
reset and a merged model sees one per ~9000 iters. At benchmark scale
(10-16 frames) the same formula fires a reset every ~single_step iters —
every model lives inside the reset/recovery thrash, a regime no reference
configuration enters (measured: leaves stuck at 8-13 dB on exact GT poses,
tools/e2e_diagnose.py round 4). The tiers therefore disable the derived
resets via opacity_reset_interval_override; floater control at this scale
comes from densify/prune alone.
"""


def tier_dims(tier: str):
    if tier == "scale":
        # reference-shaped: >=48 frames, train_level=2 (two merge levels,
        # MSS phase 1 on genuinely merged children), medium res
        return 160, 208, 48
    if tier == "full":
        return 192, 256, 16
    if tier == "medium":
        return 160, 208, 12
    return 96, 128, 10


def apply_tier(tier: str, model, pipe, optim, data_dir):
    """Mutates the three config groups for the given tier."""
    import os

    model.eval = False
    model.source_path = data_dir
    model.data_type = "blender"
    model.expname = "real_bench"
    model.category = "photo"
    model.seq_name = "hopper"
    pipe.train_level = 1
    pipe.render_mode = "tiled"
    pipe.depth_provider = "precomputed"
    pipe.depth_dir = os.path.join(data_dir, "depth")
    # toy-scale schedule correction (see module docstring)
    optim.opacity_reset_interval_override = 100_000
    # Phase A recipe (tools/pose_ablation.py, round 4, exact-GT scene):
    # the reference's vfi-midpoint strategy assumes REAL IFRNet frames;
    # with the zero-egress 'blend' substitute the ghosted midpoints bias
    # the half-fits (vfi60: 1.16 deg rot / 63% trans err vs direct120:
    # 0.72 / 33% at MATCHED compute). And Adam moves ~pose_lr per step,
    # so a fit only reaches ~lr*iters of tangent motion — edge pairs move
    # 0.174 vs 60*1e-3 = 0.06 reach. direct + lr 3e-3 at 120 iters lands
    # 0.31 deg / 13.4%, matching direct300 at 40% of the compute.
    pipe.train_pose_mode = None
    optim.pose_lr = 3e-3

    if tier == "scale":
        # the round-5 reference-scale TPU run (VERDICT r4 missing #2):
        # level-2 hierarchy (4 leaves -> 2 merges -> root), 48-frame pose
        # chain. Budgets = medium tier's; capacities preset like the full
        # tier so the auto-grow never recompiles the big graphs mid-run.
        pipe.train_level = 2
        pipe.init_max_points = 8_000
        pipe.phase_a_batch = 4
        pipe.tile_max_per_tile = 2048
        pipe.tile_dup_factor = 32
        optim.single_step = 80
        optim.phase_a_fit_iters = 300
        optim.phase_a_pose_iters = 120
        optim.leaf_init_iters = 300
        optim.mss_phase1_iteration_per_frame = 10
        optim.densification_interval = 100
        optim.densification_interval_leaf = 100
        optim.densify_from_iter = 50
    elif tier == "full":
        # sized for the remote (axon) single-chip service: the 288x384/24f
        # variant's post-merge root phase (auto-grown capacities on the
        # ~200k-gaussian merged model) exceeds the service's tolerance.
        # ~110k unprojected points/frame at 288x384; cap the init clouds and
        # the Phase A batch so 8 concurrent local models fit 16G HBM.
        pipe.init_max_points = 20_000
        pipe.phase_a_batch = 4
        # preset binning capacities for this dense close-range scene: the
        # auto-grow otherwise recompiles the big leaf graph mid-run
        # (minutes over the remote tunnel per growth step)
        pipe.tile_max_per_tile = 2048
        pipe.tile_dup_factor = 32
        optim.single_step = 100
        optim.phase_a_fit_iters = 400
        optim.phase_a_pose_iters = 150
        optim.leaf_init_iters = 400
    elif tier == "medium":
        pipe.init_max_points = 4_000
        pipe.phase_a_batch = 4
        optim.single_step = 80
        optim.phase_a_fit_iters = 300
        optim.phase_a_pose_iters = 120
        optim.leaf_init_iters = 300
        optim.mss_phase1_iteration_per_frame = 10
        optim.densification_interval = 100
        optim.densification_interval_leaf = 100
        optim.densify_from_iter = 50
    else:
        pipe.init_max_points = 400
        optim.single_step = 25
        optim.phase_a_fit_iters = 80
        optim.phase_a_pose_iters = 60
        optim.leaf_init_iters = 80
        optim.reset_recovery_iters = 5
        optim.mss_phase1_iteration_per_frame = 4
        optim.densification_interval = 60
        optim.densification_interval_leaf = 60
        optim.densify_from_iter = 30
