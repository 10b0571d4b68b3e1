"""Parity table generator: shipped fast path vs the reference-exact oracle.

Companion to tests/test_parity.py (VERDICT r2 #4). Runs the frozen golden
oracle configuration (seq sweep + traced collect + projected cost +
stride 1 + per-round priors — reference voldor.cpp semantics) and the
shipped default configuration over the parity scenes, clean and
Fisk-degraded, and writes docs/PARITY.json:

  {"clean/<scene>":    {"ate_vs_oracle": ..., "depth_med_rel": ...},
   "degraded/<scene>": {"ate_vs_oracle_per_seed": [...], "median": ...}}

ate_vs_oracle is Sim3-aligned ATE between the two trajectories divided by
scene extent (mono gauge removed); the test suite enforces 2% clean / 6%
degraded-median bounds — this report records the actual margins.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    # VOLDOR_AB_BACKEND=cpu pins the local CPU backend (the axon plugin
    # overrides the JAX_PLATFORMS env var; only jax.config works — see
    # docs/PLATFORM_NOTES.md). Parity margins are backend-independent;
    # use this when the remote-TPU tunnel is down.
    if os.environ.get("VOLDOR_AB_BACKEND") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import test_parity as tp
    from synthetic import degrade_flows

    out = {}
    for scene in tp.SCENES:
        flows, _ = tp.build_scene(scene)
        est_ref, dep_ref = tp.run_pipeline(flows, tp.REFERENCE_EXACT)
        est_fast, dep_fast = tp.run_pipeline(flows, "")
        rels = []
        for da, db in zip(dep_fast, dep_ref):
            da = np.asarray(da, np.float64)
            db = np.asarray(db, np.float64)
            da = da * (np.median(db) / max(np.median(da), 1e-9))
            rels.append(float(np.median(np.abs(da - db) / np.maximum(db, 1e-3))))
        out[f"clean/{scene}"] = {
            "ate_vs_oracle": round(float(tp.mutual_ate(est_fast, est_ref)), 5),
            "depth_med_rel": [round(r, 5) for r in rels],
        }
        print(f"clean/{scene}: {out[f'clean/{scene}']}", flush=True)

    # Degraded parity: ALL scene geometries (VERDICT r3 #6), trajectory +
    # depth, at the MILD degradation level (noise 0.6, 3 occlusions);
    # the FULL A/B contamination level follows below (degraded_full).
    for scene in tp.SCENES:
        flows0, _ = tp.build_scene(scene)
        devs, depth_rels = [], []
        for seed in (5, 17, 91):
            bad = degrade_flows(flows0, seed=seed, noise_scale=0.6,
                                n_occlusions=3)
            est_ref, dep_ref = tp.run_pipeline(bad, tp.REFERENCE_EXACT)
            est_fast, dep_fast = tp.run_pipeline(bad, "")
            devs.append(round(float(tp.mutual_ate(est_fast, est_ref)), 5))
            for da, db in zip(dep_fast, dep_ref):
                da = np.asarray(da, np.float64)
                db = np.asarray(db, np.float64)
                da = da * (np.median(db) / max(np.median(da), 1e-9))
                depth_rels.append(
                    float(np.median(np.abs(da - db) / np.maximum(db, 1e-3)))
                )
            print(f"degraded/{scene} seed {seed}: {devs[-1]}", flush=True)
        out[f"degraded/{scene}"] = {
            "ate_vs_oracle_per_seed": devs,
            "median": round(float(np.median(devs)), 5),
            "depth_med_rel": round(float(np.median(depth_rels)), 5),
        }
    # FULL-degradation parity (VERDICT r4 item 7): the same contamination
    # level as docs/ACCURACY_AB.json degraded rows (Fisk noise 1.0, 4
    # occlusions, a moving object whose motion is epipolar-inconsistent) —
    # the regime the robustness machinery exists for. On the PARITY scenes
    # the reference-exact oracle is stable here (ate_vs_gt ~1%; the
    # ACCURACY_AB collapse is specific to that harness's 10-frame scene +
    # larger object-to-frame ratio), so the anchor is meaningful; each
    # row records the oracle's own GT error so its validity is auditable.
    movobj = dict(x=18, y=20, w=26, h=22, motion=(0.5, -3.0))
    for scene in tp.SCENES:
        flows0, Ts = tp.build_scene(scene)
        gt = np.asarray(Ts, np.float64)
        devs, ora_gt, fast_gt = [], [], []
        for seed in (5, 17, 91):
            bad = degrade_flows(flows0, seed=seed, noise_scale=1.0,
                                n_occlusions=4, moving_object=movobj)
            est_ref, _ = tp.run_pipeline(bad, tp.REFERENCE_EXACT)
            est_fast, _ = tp.run_pipeline(bad, "")
            devs.append(round(float(tp.mutual_ate(est_fast, est_ref)), 5))
            ora_gt.append(round(float(tp.mutual_ate(est_ref, gt)), 5))
            fast_gt.append(round(float(tp.mutual_ate(est_fast, gt)), 5))
            print(f"degraded_full/{scene} seed {seed}: vs_oracle={devs[-1]} "
                  f"oracle_vs_gt={ora_gt[-1]} fast_vs_gt={fast_gt[-1]}",
                  flush=True)
        out[f"degraded_full/{scene}"] = {
            "ate_vs_oracle_per_seed": devs,
            "median": round(float(np.median(devs)), 5),
            "oracle_ate_vs_gt_per_seed": ora_gt,
            "fast_ate_vs_gt_per_seed": fast_gt,
        }

    out["_caveat"] = (
        "degraded rows use the mild degradation (noise 0.6, 3 occlusions, "
        "no dynamic object); degraded_full rows use the FULL A/B "
        "contamination (noise 1.0, 4 occlusions, moving object) — the "
        "reference-exact oracle is stable on these scenes at that level "
        "(oracle_ate_vs_gt_per_seed recorded per row), unlike the "
        "ACCURACY_AB harness scene where it diverges"
    )

    path = os.path.join(os.path.dirname(__file__), "..", "docs", "PARITY.json")
    with open(path, "w") as f:
        from voldor_tpu.utils.artifacts import stamp
        json.dump(stamp(out), f, indent=1)
    print(f"wrote {os.path.abspath(path)}")


if __name__ == "__main__":
    main()
