"""Probe: device vs host ACELP speech synthesis throughput.

A/B for PipelineConfig.device_voice: the host C decoder synthesizes
~14k frames/s/core (one stateful handle per carrier, thread-pooled);
the device pool (voice/jspeech_pool.py) decodes a whole batch's frames
in one jitted dispatch.  Measures steady-state frames/s at several
batch sizes with CARRIED state and a dependent final fetch (CLAUDE.md
rule 5b: chained dispatches, not a standalone-jit micro-bench — each
call's state feeds the next).

Realtime bar: one voice carrier = 33.3 frames/s, so realtime voice
carriers = frames_per_s / 33.3.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/jspeech_probe.py
Env: PERF_BATCHES ("64,256,1024"), PERF_FRAMES (2 per carrier/call),
     PERF_ITERS (20), PERF_TIMEOUT_S (3600), PERF_HOST=0 to skip the
     host baseline.
"""

import json
import os
import signal
import time

import numpy as np


def main():
    budget = int(os.environ.get("PERF_TIMEOUT_S", "3600"))
    signal.signal(signal.SIGALRM,
                  lambda *a: (_ for _ in ()).throw(TimeoutError()))
    signal.alarm(budget)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tetraear_tpu.voice import jspeech

    batches = [int(b) for b in
               os.environ.get("PERF_BATCHES", "64,256,1024").split(",")]
    n_frames = int(os.environ.get("PERF_FRAMES", "2"))
    iters = int(os.environ.get("PERF_ITERS", "20"))
    rng = np.random.default_rng(0)

    results = {"frames_per_call": n_frames, "iters": iters}

    if os.environ.get("PERF_HOST") != "0":
        from tetraear_tpu.voice import codec
        vp = codec.VoiceProcessor()
        if vp.working:
            frames = rng.integers(0, 2, (256, 138)).astype(np.int16)
            frames[:, 0] = 0
            t0 = time.perf_counter()
            vp.decode_params(frames)
            dt = time.perf_counter() - t0
            results["host_frames_per_s_core"] = round(256 / dt, 1)

    for b in batches:
        state = jspeech.init_state(b)
        fr = rng.integers(0, 2, (b, n_frames, 138)).astype(np.int32)
        fr[..., 0] = 0
        valid = np.ones((b, n_frames), bool)
        # warm (compile)
        state, pcm = jspeech.decode_block_jit(state, fr, valid)
        jax.block_until_ready(pcm)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, pcm = jspeech.decode_block_jit(state, fr, valid)
        jax.block_until_ready(pcm)        # dependent final fetch
        dt = time.perf_counter() - t0
        fps = b * n_frames * iters / dt
        results[f"device_B{b}"] = {
            "frames_per_s": round(fps, 1),
            "realtime_voice_carriers": round(fps / (8000.0 / 240.0), 1),
            "ms_per_call": round(1e3 * dt / iters, 2),
        }
        print(json.dumps({f"B{b}": results[f"device_B{b}"]}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
