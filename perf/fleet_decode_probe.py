"""Probe: offline fleet decode wall-clock, dense vs sparse hit fetch.

Measures the REAL DecodeRunner.run path (dispatch + fetch overlapped
with host parsing — CLAUDE.md rule 5b: this is a workflow measurement,
not a standalone-jit micro-bench) at fleet scale.  The dense mode
fetches the full (C, Pe) corr/crc verdict planes per block (~268 MB at
C=10240); sparse mode (the default) ships packed top-K hit
keys (~C*(K+1) int32s) and reconstructs on host
(dsp/framescan.sparse_hits docstring).

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/fleet_decode_probe.py
Env: PERF_CARRIERS (10240), PERF_BLOCKS (6), PERF_TIMEOUT_S (3600),
     PERF_MODE=dense|sparse|both (both), PERF_SOFT=1 to include the
     soft planes (dense mode fetches them; sparse mode row-gathers
     lazily via stream.LazySoftRows — the voice-fleet A/B).
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

    from tetraear_tpu.dsp.pipeline import CarrierBankDemod
    from tetraear_tpu.frame.batch import BatchedFrameDecoder
    from tetraear_tpu.runtime.stream import DecodeRunner

    c = int(os.environ.get("PERF_CARRIERS", "10240"))
    n_blocks = int(os.environ.get("PERF_BLOCKS", "6"))
    mode = os.environ.get("PERF_MODE", "both")
    soft = os.environ.get("PERF_SOFT") == "1"
    # same wideband fs family as bench.py: 72 kHz * 2^m >= 25 kHz * C
    # (channelizer.choose_decim rejects anything else)
    import math
    fs = 72_000.0 * 2 ** math.ceil(math.log2(25_000.0 * c / 72_000.0))
    rng = np.random.default_rng(0)

    bank = CarrierBankDemod(fs=fs, freqs_hz=[0.0] * c, frontend="fft")
    bl = bank.block_len
    # noise capture: fetch volume is content-independent; host select
    # cost is O(hits) and near-zero either way on noise
    iq = (rng.standard_normal(n_blocks * bl)
          + 1j * rng.standard_normal(n_blocks * bl)).astype(np.complex64)

    out = {"carriers": c, "blocks": n_blocks, "block_len": bl}
    for sparse in ([False, True] if mode == "both"
                   else [mode == "sparse"]):
        runner = DecodeRunner(bank, BatchedFrameDecoder(
            c, auto_decrypt=False), blocks_per_dispatch=2, sparse=sparse,
            fetch_soft=soft)
        # warm (compile + first dispatch), then measure a CLEAN pass:
        # reset_stream swaps in a fresh frame layer so the warm run's
        # bit tail / dedup watermarks don't contaminate the decode
        runner.run(iq[:2 * bl])
        runner.reset_stream(BatchedFrameDecoder(c, auto_decrypt=False))
        t0 = time.perf_counter()
        res = runner.run(iq)
        dt = time.perf_counter() - t0
        tag = "sparse" if sparse else "dense"
        out[f"{tag}_s"] = round(dt, 3)
        out[f"{tag}_rt_factor"] = round(n_blocks * bl / fs / dt, 3)
        out[f"{tag}_frames"] = len(res["frames"])
        print(json.dumps({tag: out[f"{tag}_s"],
                          "rt": out[f"{tag}_rt_factor"]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
