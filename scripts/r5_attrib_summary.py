"""Aggregate the round-5 quality-attribution arms into the envelope +
attribution table (VERDICT r4 task 1).

Reads docs/evidence/quality_variance/{s42,s1,s2,notaper,noexit}.json
(written by scripts/r5_attrib_arm.sh) and writes summary.json next to
them:

  * seed-noise envelope: mean/std/range of PSNR/SSIM/Prec/F-score over
    the 3 shipped-defaults seeds (42, 1, 2);
  * attribution deltas: (notaper - s42) and (noexit - s42), same seed,
    isolating the round-4 eval-count taper and the global early exit;
  * the verdict: does each ablation delta sit inside the seed envelope?

Usage: python scripts/r5_attrib_summary.py
"""

import json
import os

import numpy as np

EV = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "evidence", "quality_variance")

KEYS = [("psnr", "nvs", "psnr"), ("ssim", "nvs", "ssim"),
        ("prec", "mesh_metrics_m", "PREC"),
        ("recall", "mesh_metrics_m", "RECAL"),
        ("fscore", "mesh_metrics_m", "F-SCORE"),
        ("acc_m", "mesh_metrics_m", "ACC"),
        ("comp_m", "mesh_metrics_m", "COMP")]


def metrics_of(arm):
    with open(os.path.join(EV, arm + ".json")) as f:
        d = json.load(f)
    out = {}
    for name, sec, key in KEYS:
        try:
            out[name] = float(d[sec][key])
        except (KeyError, TypeError):
            out[name] = None
    out["train_wall_s"] = d.get("wall_secs", {}).get("train")
    out["whole_run_rays_per_sec"] = d.get("train_rays_per_sec_whole_run")
    return out


def main():
    arms = {}
    for arm in ("s42", "s1", "s2", "notaper", "noexit"):
        p = os.path.join(EV, arm + ".json")
        if os.path.exists(p):
            arms[arm] = metrics_of(arm)
    seeds = [a for a in ("s42", "s1", "s2") if a in arms]
    env = {}
    for name, *_ in KEYS:
        vals = [arms[a][name] for a in seeds
                if arms[a][name] is not None]
        if len(vals) >= 2:
            env[name] = {
                "mean": round(float(np.mean(vals)), 5),
                "std": round(float(np.std(vals, ddof=1)), 5),
                "range": round(float(np.max(vals) - np.min(vals)), 5),
                "per_seed": {a: round(arms[a][name], 5) for a in seeds},
            }
    deltas = {}
    for abl in ("notaper", "noexit"):
        if abl in arms and "s42" in arms:
            deltas[abl + "_minus_s42"] = {
                name: (round(arms[abl][name] - arms["s42"][name], 5)
                       if arms[abl][name] is not None
                       and arms["s42"][name] is not None else None)
                for name, *_ in KEYS
            }
    verdict = {}
    for abl, dd in deltas.items():
        inside = {}
        for name, delta in dd.items():
            if delta is None or name not in env:
                continue
            # inside = |ablation effect| <= seed-noise range (the most
            # conservative envelope 3 seeds can support)
            inside[name] = bool(abs(delta) <= max(
                env[name]["range"], 2 * env[name]["std"]))
        verdict[abl] = inside
    summary = {
        "design": "5 arms, 50k-step reduced reference schedule "
                  "(configs/synthetic_quality_50k.yml), full NVS + "
                  "512^3 mesh --score protocol per arm; 3 seeds of the "
                  "shipped round-4 defaults give the noise envelope, "
                  "same-seed single-toggle arms attribute the taper "
                  "and the global early exit",
        "seed_envelope": env,
        "ablation_deltas": deltas,
        "delta_inside_envelope": verdict,
        "arms_raw": arms,
    }
    out = os.path.join(EV, "summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
