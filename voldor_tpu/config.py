"""VO engine configuration.

One typed dataclass holding every hyperparameter of the VO engine, plus a
parser for the reference's whitespace ``--flag value`` config-string dialect
so existing configuration strings keep working verbatim.

Parity notes: field names, defaults and the flag registry mirror the
reference (voldor/config.h:4-324). The reference parser's ``str_to_arg``
switch is missing ``break`` statements (config.h:86-98); this implementation
converts by the declared field type instead.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields


@dataclass
class VoldorConfig:
    # --- depth prior related (config.h:7-11) ---
    omega: float = 0.15  # depth-prior rigidness strictness
    disp_delta: float = 1.0  # disparity depth-prior weight
    delta: float = 0.5  # generic depth-prior weight
    basefocal: float = 0.0  # baseline x focal

    # --- robust gaussian fit (config.h:13-20) ---
    rg_refine: int = 1
    rg_refine_last_only: int = 1
    rg_trunc_sigma: float = 3.0
    rg_covar_reg_lambda: float = 0.001  # Ledoit-Wolf shrinkage weight
    rg_pose_scaling: float = 100.0  # pool pre-scaling for f32 conditioning
    rg_max_iters: int = 100
    rg_epsilon: float = 1e-5

    # --- input params (config.h:22-27) ---
    resize_factor: float = 1.0  # deprecated upstream; resize is SLAM-layer duty
    abs_resize_factor: float = 1.0  # scale relative to the flow-network input size
    fx: float = 0.0
    fy: float = 0.0
    cx: float = 0.0
    cy: float = 0.0
    exclusive_gpu_context: int = 1  # accepted for compat; device caching is automatic here

    # --- debug (config.h:29-34) ---
    debug: bool = False
    silent: bool = False
    save_everything: bool = False
    viz_img_per_row: int = 2
    viz_depth_scale: float = 5.0

    # --- hyper params (config.h:36-40) ---
    lambda_: float = 0.15  # rigidness strictness ('lambda' is reserved in Python)
    meanshift_kernel_var: float = 0.1
    meanshift_rvec_scale: float = 25.0
    norm_world_scale: int = 1

    # --- pose sampling (config.h:42-50) ---
    cpu_p3p: int = 0  # accepted for compat; P3P always runs on device
    lambdatwist: int = 1  # 1 = LambdaTwist P3P (default), 0 = AP3P (ops/ap3p.py)
    n_poses_to_sample: int = 8192
    pose_sample_min_depth: float = 0.1
    pose_sample_max_depth: float = 1000.0
    max_trace_on_flow: int = 3
    # TPU knob (no reference analog): collect P3P correspondences on a
    # strided pixel subgrid. 1 = reference-exact (the default): on the
    # multi-seed Fisk-degraded harness the full grid is the most robust
    # setting (median t_rel 5.2% vs 49.1% at stride 2 over 5 noise seeds —
    # docs/ACCURACY_AB.json `degraded/default_anch_hyb_obs` vs
    # `degraded/stride2`, regenerated at fa6cceb; single-seed comparisons
    # of this knob flip randomly, see tools/ab_accuracy.py). With the
    # gather-free obs collect the stride no longer buys meaningful TPU
    # time; keep 1.
    pose_sample_stride: int = 1
    rigidness_threshold: float = 0.5
    rigidness_sum_threshold: float = 1.0

    # --- truncation (config.h:52-57) ---
    trunc_rigidness_density: float = 0.05
    trunc_sample_density: float = 0.001
    no_trunc_iters: float = 2
    max_iters: int = 5
    min_iters_after_trunc: int = 3
    # TPU deviation (no reference analog): convergence-adaptive iteration
    # EXTENSION. The reference runs a fixed max_iters EM schedule
    # (voldor.cpp:130-149); on heavily degraded windows (noise + occlusion
    # + dynamic object simultaneously) five iterations are not enough for
    # the rigidness E-step to isolate the contamination, and the window
    # pose locks onto a biased mode (tests/test_degraded.py scene: 7.1 deg
    # final rotation error at 5 iters vs 1.6 deg at 7). When the window
    # poses have NOT converged (max per-frame step between EM iterations
    # > pose_converge_eps: rotation-vector norm + relative translation
    # norm), the solve keeps iterating up to max_iters_ext. Clean windows
    # converge well inside max_iters, so the extension costs nothing on
    # the benchmark path; max_iters itself is never early-stopped (the
    # reference-parity floor). 0 disables the extension.
    # eps calibration (/tmp conv probe, 72x96 synthetic): clean windows
    # settle at a 0.015-0.03 sampling-noise floor after iteration 2;
    # contaminated windows stay above 0.1 — 0.05 separates them.
    max_iters_ext: int = 8
    pose_converge_eps: float = 0.05
    # TPU deviation (no reference analog): convergence-adaptive EARLY STOP,
    # the symmetric counterpart of the extension above. When > 0 and the
    # window poses have converged (same pose_converge_eps signal), the solve
    # schedules ONE more EM iteration — flagged as the last, so the
    # robust-Gaussian covariance refit still runs (rg_refine_last_only) —
    # and exits. The value is the minimum total iteration count, so e.g. 3
    # turns the clean-window schedule [5 iters] into [3 iters] while
    # contaminated windows (pose_delta above eps) keep the full schedule
    # plus the extension. 0 disables (reference-exact fixed schedule).
    # SHIPPED DEFAULT 3: at the shipped compute scale the A/B
    # (docs/ACCURACY_AB.json, 8 degraded seeds) measures
    # early_stop3_shipped == default_shipped on degraded flow (median
    # t_rel 5.48% vs 5.50%, per-seed max 8.8% both) and a negligible
    # clean-flow cost (0.83% vs 0.55% t_rel, both ~0.8mm/m absolute);
    # converged windows then run 3+1 EM iterations instead of 5, a direct
    # cut to the dominant per-window solve cost.
    early_stop_min_iters: int = 3

    # --- forward-backward rigidness smoothing (config.h:59-62) ---
    fb_smooth: int = 1
    fb_emm: float = 0.5  # emission probability of the off state
    fb_no_change_prob: float = 0.9

    # --- depth update (config.h:64-69) ---
    optimize_depth: int = 1
    depth_rand_samples: int = 10
    depth_global_prop_step: int = 8
    depth_local_prop_width: int = 32
    depth_range_factor: float = 1.0

    # --- meanshift (config.h:71-75) ---
    meanshift_max_iters: int = 100
    meanshift_max_init_trials: int = 20
    meanshift_good_init_confidence: float = 0.5
    meanshift_epsilon: float = 1e-5

    # --- legacy KITTI ground estimation (config.h:77-82; unused upstream) ---
    kitti_estimate_ground: int = 0
    kitti_ground_holo_width: int = 5
    kitti_ground_roi: float = 0.4
    kitti_ground_meanshift_kernel_var: float = 0.01

    # --- TPU-specific knobs (no reference equivalent) ---
    # 'jump'  : jump-flooding local propagation (parallel, TPU-friendly)
    # 'exact' : bit-faithful sequential chunk scan (slow; for parity tests)
    depth_local_prop_mode: str = "jump"
    # 'anchored'  : gather-free cost against track planes re-anchored every
    #               round along the current depth's projected chain (shares
    #               the chain trace with the rigidness refresh; accuracy of
    #               'projected' at the speed of 'tracked' — docs/ACCURACY_AB)
    # 'tracked'   : gather-free cost against frame-0 observed tracks
    # 'projected' : reference-exact candidate-dependent tracing
    depth_cost_mode: str = "anchored"
    # Fused Pallas kernel for batched candidate-cost evaluation:
    # 'auto' = on TPU backends, 'on', 'off'. (~190x over the XLA-fused
    # equivalent on v5e; requires depth_cost_mode == 'tracked'.)
    use_pallas_cost: str = "auto"
    # Camera-sweep schedule over the window (voldor.cpp:164-201 is a
    # sequential Gauss-Seidel sweep: frame i's collect uses the poses of
    # frames < i updated in the same sweep):
    # 'seq'    : reference-exact sequential sweep
    # 'jacobi' : all frames batched against the pre-sweep poses (one
    #            collect scan, one N*8192 P4P batch, vmapped meanshift/rg)
    # 'hybrid' : sequential on EM iteration 1 (poses are still zero and
    #            frame i genuinely needs frame i-1's estimate), jacobi on
    #            iterations 2+ (poses only drift). Accuracy A/B on the
    #            degraded harness: tests/test_degraded.py + docs/ACCURACY_AB.
    # Default 'hybrid': with collect_mode 'obs' + cost 'anchored' it is both
    # faster AND more accurate than the sequential reference schedule on the
    # Fisk-degraded pipeline (ate/extent 3.1% vs 9.7%; docs/ACCURACY_AB).
    # WARNING: plain 'jacobi' (batched from EM iteration 1, when the window
    # poses are still zero) is for ablation/testing ONLY — it loses the
    # Gauss-Seidel chain on the iteration that needs it and measured 22.8%
    # t_rel on a CLEAN scene (docs/ACCURACY_AB.json clean/jacobi_warmstart).
    # 'seq' and 'hybrid' are the supported production values; the engine
    # prints a loud warning when 'jacobi' is selected.
    pose_window_sweep: str = "hybrid"
    # Depth-prior sampling schedule for the tracked/anchored cost:
    # 'solve' : sample the prior maps ONCE at solve start (depth is warm-
    #           started from the priors, so the projection barely moves;
    #           saves ~150ms per prior per window — the prior gathers are
    #           the only per-round gathers left). Confs refresh once at end.
    # 'round' : reference-closer per-round resampling.
    prior_sample_mode: str = "solve"
    # P3P correspondence source for the batched (jacobi) sweep:
    # 'traced' : reference-exact per-candidate trace (flow gathers dominate)
    # 'obs'    : hoisted/re-anchored track positions (gather-free; same
    #            fixed point — see collect_p3p_instances_obs)
    pose_collect_mode: str = "obs"
    # Host->device transfer precision for the bulky per-window inputs
    # (flows in f16, depth priors in bf16 — wide range, depth can exceed
    # f16's 65504): halves the tunnel upload time (~55ms/window on axon).
    # Quantization error (<=0.05px at 100px flows; <=0.4% prior depth) sits
    # well below the Fisk noise floor; compute stays f32 on device.
    # 'float32' uploads everything exact.
    transfer_dtype: str = "float16"
    # PRNG seed for pose sampling / depth proposals (reference RAND_SEED 233,
    # optimize_depth.cu:8 / collect_p3p_instances.cu:6).
    seed: int = 233

    # Flags that are presence-only booleans in the reference dialect
    # (config.h:155-160: `--debug`, `--silent`, `--save_everything`).
    _PRESENCE_FLAGS = ("debug", "silent", "save_everything")
    # Flag spelling that differs from the field name.
    _FLAG_ALIASES = {"lambda": "lambda_"}

    def copy(self, **overrides) -> "VoldorConfig":
        return dataclasses.replace(self, **overrides)

    @classmethod
    def _field_map(cls):
        return {f.name: f for f in fields(cls)}

    def read_config(self, config_str: str) -> "VoldorConfig":
        """Parse a whitespace-separated ``--flag value`` string in place.

        Mirrors Config::read_config (voldor/config.h:110-253): unknown flags
        raise, presence flags take no value, everything else consumes one
        value token converted to the field's declared type.
        """
        tokens = config_str.split()
        fmap = self._field_map()
        i = 0
        while i < len(tokens):
            tok = tokens[i]
            if not tok.startswith("--"):
                raise ValueError(f"Invalid input config : {tok}")
            name = tok[2:]
            name = self._FLAG_ALIASES.get(name, name)
            if name in self._PRESENCE_FLAGS:
                setattr(self, name, True)
                i += 1
                continue
            if name not in fmap:
                raise ValueError(f"Invalid input config : {tok}")
            if i + 1 >= len(tokens):
                raise ValueError(f"Config flag {tok} missing its value")
            raw = tokens[i + 1]
            ftype = fmap[name].type
            if ftype in ("int", int):
                setattr(self, name, int(float(raw)))
            elif ftype in ("float", float):
                setattr(self, name, float(raw))
            elif ftype in ("bool", bool):
                setattr(self, name, raw.strip().lower() not in ("0", "false", ""))
            else:
                setattr(self, name, raw)
            i += 2
        return self

    @classmethod
    def from_string(cls, config_str: str, **overrides) -> "VoldorConfig":
        cfg = cls(**overrides)
        cfg.read_config(config_str)
        return cfg

    def to_string(self) -> str:
        """Serialize the non-default fields back to the flag dialect."""
        default = VoldorConfig()
        parts = []
        rev_alias = {v: k for k, v in self._FLAG_ALIASES.items()}
        for f in fields(self):
            if f.name.startswith("_"):
                continue
            val = getattr(self, f.name)
            if val == getattr(default, f.name):
                continue
            flag = rev_alias.get(f.name, f.name)
            if f.name in self._PRESENCE_FLAGS:
                if val:
                    parts.append(f"--{flag}")
            else:
                parts.append(f"--{flag} {val}")
        return " ".join(parts)
