"""Headline benchmark: config 3 — textured ~100k-tri terrain @ 1920x1080
(BASELINE.json:9) on the local TPU. Prints ONE JSON line (the LAST stdout
line is always valid JSON, under every failure mode).

vs_baseline is fps / 60: the north-star target is >=60 fps on this scene
class (BASELINE.json:5 — target hardware is v5p; this box is v5 lite, so
record but don't conflate, SURVEY.md §7.4).

Failure-mode contract (SURVEY.md §7.3.1 "fail loudly"; round-3 lesson —
BENCH_r03.json recorded rc 124 / empty tail because the old bench waited
silently on a backend outage until the driver killed it):

- Progress lines ("# bench: ...") are printed FLUSHED to stdout from the
  first health attempt on, so a killed run still has a non-empty,
  explanatory tail.
- One total budget (XR_BENCH_TOTAL_BUDGET, default 1500 s) covers health
  wait + compile + run. On expiry the parent prints a structured JSON
  line with "value": null and an "error" field, and exits 0 — WITHOUT
  killing the measurement child: the child is detached and left to finish
  so it warms the persistent compile cache for the next run (killing a
  mid-compile process wedges the remote compile service, CLAUDE.md).
- SIGTERM/SIGINT (e.g. the driver's own timeout) also produce a final
  JSON line before exit.

Env knobs: XR_BENCH_TOTAL_BUDGET, XR_BENCH_HEALTH_WAIT (cap on the health
phase, default min(900, budget/2)), XR_BENCH_FRAMES (default 30),
XR_BENCH_FORCE_UNHEALTHY=1 (test hook: health check always fails).
"""

import json
import os
import signal
import subprocess
import sys
import time

# persistent compile cache: first bench run pays the (minutes-long) remote
# TPU compile; later runs reuse it
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_xr")

METRIC = "config3_textured_100k_tris_1080p_fps"
_T0 = time.monotonic()
_STATE = {"phase": "init", "health": "unknown"}


def _say(msg: str) -> None:
    print(f"# bench: {msg} [t+{time.monotonic() - _T0:.0f}s]", flush=True)


def _fail_json(error: str, **extra) -> None:
    """The guaranteed-parseable last line for every non-success path."""
    out = {
        "metric": METRIC,
        "value": None,
        "unit": "fps",
        "vs_baseline": None,
        "error": error,
        "extra": {
            "phase": _STATE["phase"],
            "backend_health": _STATE["health"],
            "elapsed_s": round(time.monotonic() - _T0, 1),
            **extra,
        },
    }
    print(json.dumps(out), flush=True)


def _on_signal(signum, frame):
    _fail_json(f"killed_by_signal_{signum}")
    # the driver's timeout follows SIGTERM with SIGKILL; exit now so the
    # JSON line above is the recorded tail
    os._exit(0)


def _health_ok() -> bool:
    """One COMPILE-FREE health attempt in a subprocess (safe to kill).

    The axon backend has hours-long outages with two failure modes
    (CLAUDE.md): fast-fail UNAVAILABLE errors and hard hangs of even
    jax.devices(). A subprocess attempt can be timeout-killed without a
    compile in flight, so it never wedges the compile service.
    """
    if os.environ.get("XR_BENCH_FORCE_UNHEALTHY"):
        return False
    check = (
        "import jax, numpy as np\n"
        "d = jax.devices()[0]\n"
        "x = jax.device_put(np.arange(8, dtype=np.float32), d)\n"
        "assert float(np.asarray(x)[3]) == 3.0\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", check], timeout=240, capture_output=True
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _await_backend_health(deadline_s: float) -> bool:
    _STATE["phase"] = "health_poll"
    t_end = time.monotonic() + deadline_s
    attempt = 0
    while True:
        attempt += 1
        t_a = time.monotonic()
        ok = _health_ok()
        _STATE["health"] = "ok" if ok else "failing"
        _say(
            f"health attempt {attempt}: {'OK' if ok else 'FAILED'} "
            f"({time.monotonic() - t_a:.0f}s)"
        )
        if ok:
            return True
        if time.monotonic() >= t_end:
            return False
        time.sleep(min(60.0, max(1.0, t_end - time.monotonic())))


def measure(frames: int) -> dict:
    """The actual benchmark (runs in the detached child)."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import functools

    import jax.numpy as jnp
    import numpy as np

    from xr.app.renderer import render_step
    from xr.pipeline.geometry import clip_capacity
    from xr.scene.presets import config3_terrain

    p = config3_terrain()
    scene = jax.tree_util.tree_map(jnp.asarray, p.scene)
    cap = clip_capacity(scene.mesh.num_triangles, p.config)

    # the WHOLE frame — including camera/model animation — is one jitted
    # program of a scalar t (SURVEY.md §3.2); per-frame host work is one
    # dispatch (this box's tunneled device makes per-op dispatch ~1ms)
    @functools.partial(jax.jit, static_argnames=())
    def frame_at(t):
        cam, mm = p.animate(t, jnp)
        return render_step(
            scene.replace(model_matrices=mm), cam, config=p.config,
            capacity=cap,
        )

    # compile + warmup (the PSO build; SURVEY.md §3.1)
    f = frame_at(0.0)
    jax.block_until_ready(f.color)
    stats = {k: int(np.asarray(v)) for k, v in f.stats.items()}
    assert stats["clip_overflow"] == 0 and stats["bin_overflow"] == 0, stats

    last = None
    t0 = time.perf_counter()
    for i in range(frames):
        last = frame_at(0.05 * (i + 1))
    jax.block_until_ready(last.color)
    dt = (time.perf_counter() - t0) / frames
    last_stats = {k: int(np.asarray(v)) for k, v in last.stats.items()}
    assert (
        last_stats["clip_overflow"] == 0 and last_stats["bin_overflow"] == 0
    ), last_stats

    fps = 1.0 / dt
    # measured shaded work from the device counter (BASELINE.json:2), not
    # re-derived from the resolution
    mpix = last_stats["fragments_shaded"] * fps / 1e6
    return {
        "metric": METRIC,
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
        "extra": {
            "mpixels_shaded_per_s": round(mpix, 1),
            "ms_per_frame": round(dt * 1e3, 2),
            "tris_setup": stats["tris_setup"],
            "device": str(jax.devices()[0]),
            "backend": jax.default_backend(),
        },
    }


def _child_main(out_path: str) -> None:
    frames = int(os.environ.get("XR_BENCH_FRAMES", 30))
    try:
        result = measure(frames)
    except BaseException as e:  # noqa: BLE001 — recorded, not swallowed
        result = {
            "metric": METRIC,
            "value": None,
            "unit": "fps",
            "vs_baseline": None,
            "error": f"measure_failed: {type(e).__name__}: {e}"[:500],
        }
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(result, f)
    os.replace(tmp, out_path)  # atomic: parent only ever sees complete JSON


def main() -> None:
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    budget = float(os.environ.get("XR_BENCH_TOTAL_BUDGET", 1500))
    health_cap = float(
        os.environ.get("XR_BENCH_HEALTH_WAIT", min(900.0, budget / 2))
    )
    t_end = _T0 + budget
    _say(f"total budget {budget:.0f}s, health cap {health_cap:.0f}s")

    healthy = _await_backend_health(min(health_cap, t_end - time.monotonic()))
    if not healthy:
        _say("backend unhealthy at health deadline; recording and exiting")
        _fail_json("backend_unavailable")
        return

    # Measurement runs in a DETACHED child writing JSON to a file. On
    # budget expiry the parent reports and exits but leaves the child
    # running: it finishes the compile and warms the persistent cache, and
    # killing it mid-compile would wedge the compile service (CLAUDE.md).
    _STATE["phase"] = "measure"
    # unique per RUN (pid alone can recycle onto an orphaned child's stale
    # result file — a detached child from a deadline_exceeded run writes
    # its JSON after the parent exits)
    tag = f"{os.getpid()}_{int(_T0 * 1000) & 0xFFFFFFFF}"
    out_path = f"/tmp/xr_bench_result_{tag}.json"
    child_log = f"/tmp/xr_bench_child_{tag}.log"
    for p in (out_path, out_path + ".tmp"):
        if os.path.exists(p):
            os.unlink(p)
    with open(child_log, "wb") as lf:
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--measure", out_path],
            stdout=lf, stderr=subprocess.STDOUT, start_new_session=True,
        )
    _say(f"measurement child pid {child.pid} (log {child_log})")

    last_note = 0.0
    while time.monotonic() < t_end:
        if os.path.exists(out_path):
            with open(out_path) as f:
                result = json.load(f)
            if result.get("value") is None:
                _say("child finished with an error")
                print(json.dumps(result), flush=True)
            else:
                print(json.dumps(result), flush=True)
            return
        if child.poll() is not None and not os.path.exists(out_path):
            _fail_json(
                f"measure_child_died_rc_{child.returncode}",
                child_log=child_log,
            )
            return
        if time.monotonic() - last_note > 120:
            _say("measuring (compile can take 12-18 min cold)...")
            last_note = time.monotonic()
        time.sleep(5)

    _say(
        "total budget expired; child left running to finish + warm the "
        "compile cache"
    )
    _fail_json(
        "deadline_exceeded", child_pid=child.pid, child_log=child_log,
        child_alive=child.poll() is None,
    )


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--measure":
        _child_main(sys.argv[2])
    else:
        main()
