"""Default configuration tree.

Key-compatible with the reference's YACS schema (reference
configs/base_config.py:1-267) so its experiment YAMLs (e.g.
configs/mp3d_gaussian_FR_eccv.yaml) merge cleanly, plus a `tpu` block for
settings with no reference analog (capacities, tile sizes, mesh axes).
"""
from .node import ConfigNode


def get_cfg_defaults() -> ConfigNode:
    cfg = ConfigNode()

    cfg.workdir = "experiments/Habitat"
    cfg.run_name = "debug"
    cfg.turn_angle = 10.0
    cfg.forward_step_size = 0.15
    cfg.img_height = 256
    cfg.img_width = 256
    cfg.H_reg_lambda = 0.1
    cfg.H_point_weight = 0.5
    cfg.H_pose_weight = 0.5
    cfg.path_pose_weight = 0.2
    cfg.path_point_weight = 1.0
    cfg.path_end_weight = 1.0
    cfg.object_path_end_weight = 1.0
    cfg.acc_H_train_every = 5
    cfg.num_uniform_H_train = -1
    cfg.opacity_pixel_weight = 0.00001
    cfg.vol_weighted_H = False
    cfg.criterion = "fisher"  # fisher | topt | dopt

    cfg.policy = ConfigNode(dict(
        name="oracle",
        with_rrt_planning=False,
        fbe=False,
        exploration=True,
        save_nav_images=False,
        workdir=cfg.workdir,
        run_name=cfg.run_name,
        steps_after_plan=20,
        occupancy_height_thresh=-1.0,
        planning_queue_size=40,
        action_seq_file="",
        height_upper=1.3,
        height_lower=0.1,
        pcd_far_distance=7.0,
        # directory of trained UPEN predictor-ensemble checkpoints
        # (scripts/train_predictors.py member_*.pkl); "" = random init
        # (reference loads its ensemble from --ensemble_dir,
        # models/UPEN.py:34-48)
        ensemble_dir="",
    ))

    cfg.planning_queue_size = 40
    cfg.num_frames = 800
    cfg.checkpoint_interval = 40
    cfg.keyframe_every = 4
    cfg.keyframe_obj_every = 2
    cfg.map_every = 10
    cfg.map_obj_every = 2
    cfg.downsample_pcd = 1
    cfg.mapping_window_size = 32

    cfg.report_global_progress_every = 10
    cfg.report_iter_progress = False
    cfg.eval_every = -1
    cfg.save_checkpoints = True
    cfg.scene_radius_depth_ratio = 3
    cfg.use_wandb = False
    cfg.mean_sq_dist_method = "projective"
    cfg.isotropic = False

    cfg.mapping = ConfigNode(dict(
        add_new_gaussians=True,
        add_rand_gaussians=True,
        visualize_frame=0,
        densify_dict=dict(
            final_removal_opacity_threshold=0.005,
            removal_opacity_threshold=0.005,
            densify_every=100,
            grad_thresh=0.0002,
            num_to_split_into=2,
            remove_big_after=3000,
            reset_opacities_every=3000,
            start_after=500,
            stop_after=5000,
            depth_error_ratio=5,
            add_random_gaussians=True,
        ),
        ignore_outlier_depth_loss=False,
        loss_weights=dict(depth=1.0, im=0.5),
        lrs=dict(
            cam_trans=0.0,
            cam_unnorm_rots=0.0,
            log_scales=0.01,
            logit_opacities=0.05,
            means3D=0.001,
            rgb_colors=0.0025,
            unnorm_rotations=0.001,
        ),
        num_iters=60,
        prune_gaussians=False,
        pruning_dict=dict(
            final_removal_opacity_threshold=0.005,
            removal_opacity_threshold=0.005,
            prune_every=20,
            remove_big_after=0,
            reset_opacities=False,
            reset_opacities_every=500,
            start_after=0,
            stop_after=800,
        ),
        sil_thres=0.5,
        use_gaussian_splatting_densification=False,
        use_l1=True,
        use_sil_for_loss=False,
    ))

    cfg.tracking = ConfigNode(dict(
        depth_loss_thres=20000,
        forward_prop=True,
        ignore_outlier_depth_loss=False,
        loss_weights=dict(depth=1.0, im=0.5),
        lrs=dict(
            cam_trans=0.002,
            cam_unnorm_rots=0.0004,
            log_scales=0.0,
            logit_opacities=0.0,
            means3D=0.0,
            rgb_colors=0.0,
            unnorm_rotations=0.0,
        ),
        num_iters=40,
        sil_thres=0.89,
        use_depth_loss_thres=True,
        use_gt_poses=True,
        with_droid=False,
        use_l1=True,
        use_sil_for_loss=True,
        visualize_tracking_loss=False,
    ))

    cfg.explore = ConfigNode(dict(
        height_range=0.6,
        prune_invisible=False,
        sample_view_num=120,
        sample_range=2.0,
        min_range=0.2,
        cell_size=0.1,
        use_frontier=False,
        add_random_gaussians=False,
        grid_candidates=8,
        grid_multipler=3,
        centering=True,
        shortcut_path=True,
        planner_backend="sweep",   # jitted whole-grid relaxation (one field
                                   # serves every goal); "astar" = host A*
        clearance_m=-1.0,          # C-space obstacle inflation radius;
                                   # -1 = auto from the sim agent radius,
                                   # 0 = off (raw reference behavior)
        frontier_select_method="largest",
    ))

    cfg.explore_object = ConfigNode(dict(
        sample_range=3.0,
        min_range=1.0,
        sample_view_num=64,
    ))

    # SLAM block (MonoGS-compatible keys; reference base_config.py:160-260).
    cfg.SLAM = ConfigNode()
    cfg.SLAM.Results = ConfigNode(dict(
        save_results=False,
        save_dir="experiments/GaussianSLAM",
        save_trj=False,
        save_trj_kf_intv=5,
        use_gui=False,
        eval_rendering=False,
        use_wandb=False,
    ))
    cfg.SLAM.Dataset = ConfigNode(dict(
        type="habitat",
        sensor_type="depth",
        pcd_downsample=128,
        pcd_downsample_init=32,
        adaptive_pointsize=True,
        point_size=0.01,
        Calibration=dict(
            fx=128, fy=128, cx=128, cy=128,
            k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0,
            distorted=False, width=256, height=256, depth_scale=1.0,
        ),
    ))
    cfg.SLAM.Training = ConfigNode(dict(use_gt_pose=True, spherical_harmonics=False))
    cfg.SLAM.opt_params = ConfigNode(dict(lambda_dssim=0.2))
    cfg.SLAM.model_params = ConfigNode(dict(sh_degree=0, white_background=False))
    cfg.SLAM.pipeline_params = ConfigNode(dict(convert_SHs_python=False, compute_cov3D_python=False))

    # --- TPU-build-only settings (no reference analog) ---------------------
    cfg.tpu = ConfigNode(dict(
        tile_size=16,              # rasterizer tile edge in pixels
        max_per_tile=256,          # initial per-tile Gaussian capacity
                                   # (auto-doubles up to max_per_tile_limit
                                   # when truncation exceeds
                                   # overflow_bump_ratio; gather rows and
                                   # blend FLOPs scale linearly with it)
        max_per_tile_limit=512,    # K=1024 doubles mapping-event cost
                                   # (2.76 s vs 1.77 s at 19k Gaussians)
                                   # for no measurable quality gain: the
                                   # truncated farthest splats are behind
                                   # the blend's T<1e-4 saturation point
                                   # (240-step gate: AUC 61.36 / cov2d
                                   # 75.0 / coverage@5cm 83.99 at 512 ==
                                   # the 1024 numbers, +34% steps/s)
        overflow_bump_ratio=1e-3,
        fisher_tile_size=32,       # larger tiles for the Fisher pass: 4x
                                   # fewer tiles -> 4x less binning memory
                                   # -> wider vmap over candidate poses
        fisher_max_per_tile=512,   # K=512 ranks candidates identically to
                                   # 1024 (spearman 1.0) at half the cost
                                   # (6.9 ms/pose batched); K=256 is ~2x
                                   # faster again (3.6 ms/pose) with
                                   # near-identical ranking (spearman
                                   # 0.99, same argmax) and equal 240-step
                                   # episode quality, but perturbs short-
                                   # horizon trajectories -- opt in per
                                   # config
        capacity=32768,            # initial Gaussian-state slot capacity
        capacity_growth=2,         # grow factor when slots run out
        blend_chunk=256,           # depth-chunk size of the blend walk
                                   # (clamped to max_per_tile).  256 vs
                                   # 64 measured ~6% off the mapping
                                   # event on v5e (fewer sequential
                                   # chunk iterations, larger MXU
                                   # shapes); math is grouping-invariant
        pose_chunk=32,             # candidate poses evaluated per XLA launch
        object_pose_chunk=8,       # object-branch pose batch (the 11-dim
                                   # Hutchinson Hessian is ~3x wider than
                                   # the scene Fisher diag)
        pipeline_planning=False,   # opt-in: dispatch candidate scoring at
                                   # a queue-low watermark. Measured ~zero
                                   # gain on a saturated device (scoring
                                   # queues behind mapping) and the
                                   # 2-step-stale frontiers perturb
                                   # trajectories (bench coverage 69.95 ->
                                   # 65.71); useful only when planning is
                                   # host-bound
        plan_watermark=2,
        mapping_frames_per_iter=1,  # >1: minibatch mapping (TPU upgrade;
                                    # 1 = reference one-frame-per-iter)
        fisher_downsample=2,       # EIG renders at (H/s, W/s): candidate
                                   # ranking is downsample-stable (gated,
                                   # tests/test_fisher_downsample.py);
                                   # grad_value and camera.dilation are
                                   # scale-compensated.  Default 2 after
                                   # a 3-seed 240-step hardware A/B:
                                   # completeness 80.6 vs 79.4, AUC 60.0
                                   # vs 59.9, PSNR 20.2 vs 20.5 (seed
                                   # noise), +20% episode throughput.
                                   # Set 1 for exact reference-res EIG.
        fisher_mode="sq_chain",    # sq_chain | hutchinson
        fisher_engine="auto",      # auto | pallas | xla (auto: pallas on
                                   # real TPU, xla on the CPU test backend)
        blend_backward="auto",     # auto | pallas | xla: backward engine
                                   # for the mapping/tracking blend VJP
        blend_forward="pallas",    # pallas | xla: forward blend engine
                                   # inside the custom-VJP path (pallas =
                                   # in-kernel early termination; only
                                   # active when blend_backward resolves
                                   # to pallas).  Default flipped to
                                   # pallas after the r2 hardware A/B:
                                   # two adjacent 240-step episode pairs
                                   # 126.3/127.9 s (pallas) vs
                                   # 131.8/142.7 s (xla), identical
                                   # quality (AUC 61.35/61.36)
        hutchinson_probes=8,
        object_h_train_window=64,  # keyframe budget per object planning
                                   # event: H_train sums a strided
                                   # subsample of W keyframes spanning
                                   # the whole history, scaled by K/W
                                   # (0 = exact full sum, the reference's
                                   # O(K)-per-event behavior,
                                   # gaussian_object.py:1553-1585).
                                   # Ranking-equivalence gate:
                                   # tests/test_object_slam.py Spearman
                                   # >= 0.95 vs exact
        h_train_window=96,         # scene H_train keyframe budget per
                                   # planning event (strided K/W subsample
                                   # scaled by K/W; 0 = exact full sum,
                                   # the reference's O(K) per event,
                                   # gaussian.py:1338-1348).  Ranking gate:
                                   # tests/test_slam.py Spearman >= 0.95
        mesh_axes=dict(data=1, model=1),
        near=0.01,
        far=100.0,
        max_depth=15.0,            # median-depth fallback (forward.cu:300-393)
    ))

    return cfg
