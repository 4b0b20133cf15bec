"""Benchmark: real-time TETRA carriers per chip.

Headline metric (the JSON line): END-TO-END IQ -> CRC-checked frames.
The chained device program per block runs the full receive chain — NCO
mix / FFT channelizer -> polyphase resample -> RRC -> timing recovery ->
DQPSK -> bits -> sync correlation at every symbol-aligned position ->
burst CRC-16 error count at every possible frame start
(dsp.framescan.frame_scan_packed_even, the MXU-packed dense conv; a
frame start can only sit at an even bit index) — with a carried
on-device bit tail, and
reduces to per-block sync-hit / CRC-pass counters.  The clock stops after fetching a value that depends on every
stage of every block, so nothing the label claims is left untimed
(round-1 weakness: the old bench stopped at hard symbols while the frame
layer ran untimed on host).  The demod-only number is also measured and
reported as an extra key + stderr line.

Baseline = 1: the reference processes exactly one carrier per process
and must finish each 54 ms chunk within 54 ms on a desktop CPU
(tetraear/ui/modern.py:1908-1912) — and its frame layer (sync search,
CRC, MAC parse) is *included* in that 54 ms budget, so the honest
comparison is the end-to-end number.

Host-side per-hit MAC/SDS parsing is NOT in the loop by design: it is
O(actual frames), runs concurrently with device dispatches in
production, and SURVEY.md section 7 assigns it to the host.  What the
device must sustain densely — and what this measures — is everything up
to and including the CRC verdict for every candidate position.

Timing methodology: the per-block state is chained through S = STEPS
sequential jitted steps (a data dependency the runtime cannot reorder or
overlap), and the clock stops only after a value depending on the final
state is fetched to the host.  This is robust against async dispatch and
relay-acknowledged-but-not-executed effects seen on the axon backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache: the big-FFT graphs take minutes
    to compile through the axon remote-compile relay; cache them across
    bench invocations."""
    import jax
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               str(os.path.join(os.path.dirname(
                                   os.path.abspath(__file__)),
                                   ".jax_cache")))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _make_bank(n_carriers: int, block, frontend: str):
    import math
    from tetraear_tpu.dsp.pipeline import CarrierBankDemod

    # capture bandwidth scales with the carrier count (25 kHz channel
    # grid + 15% guard).  fs in the 72 kHz * 2^m family makes the
    # channel rate exactly 72 kHz — the whole polyphase resample back
    # half disappears (measured 40.7 ms/block at C=10240 pre-fusion
    # family 10.24 MHz * 2^j).  The 25 kHz grid is not 128-bin aligned
    # at these rates; dsp/channelizer.py's quantized row-gather path
    # (rolled H1 + residual ramp) keeps extraction row-shaped anyway.
    needed = max(9.216e6, n_carriers * 25_000 * 1.15)
    fs = 72_000.0 * 2 ** math.ceil(math.log2(needed / 72_000.0))
    offsets = [(i - n_carriers // 2) * 25_000 + 12_500
               for i in range(n_carriers)]
    # fused-envelope cap (round-4 finding: the remote compile helper
    # crashes on nfft=2^27 graphs — perf/out_agenda14/bench_c40960.log).
    # Geometries past the cap run the SAME fused kernels on half-size
    # sequential overlap-save blocks: choose_nfft would pick 0.1 s of
    # input, the cap pins nfft at 2^26 and the streaming state carry
    # keeps the halved blocking decode-equivalent (symbols spanning the
    # extra boundaries decode error-free — tests/unit/
    # test_channelizer.py::test_nfft_cap_decode_equivalent).  So the
    # C=40960 answer degrades to ~the fused per-carrier rate, not to
    # the classic rung's 2.3x loss.  BENCH_NFFT_CAP=0 disables.
    nfft = None
    if frontend == "fft":
        from tetraear_tpu.dsp import channelizer as chan_mod
        cap = int(os.environ.get("BENCH_NFFT_CAP", str(2 ** 26)))
        if cap and chan_mod.choose_nfft(fs) > cap:
            nfft = cap
    return CarrierBankDemod(fs=fs, freqs_hz=offsets, block_len=block,
                            frontend=frontend, nfft=nfft), fs


def _time_chain(chain_j, args_fn, steps: int, fetch) -> float:
    """Compile/warm once, then time a second run; fetch forces sync."""
    out = chain_j(*args_fn())
    fetch(out)
    t0 = time.time()
    out = chain_j(*args_fn())
    fetch(out)
    return time.time() - t0


def run_bench(n_carriers: int = 256, block: int | None = None,
              steps: int = 20, frontend: str = "fft",
              mode: str = "both") -> dict:
    import jax
    _enable_compile_cache()
    import jax.numpy as jnp
    from tetraear_tpu.dsp import framescan, kernels

    bank, fs = _make_bank(n_carriers, block, frontend)
    block = bank.block_len

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(block)
         + 1j * rng.standard_normal(block)).astype(np.complex64)
    xd = jnp.asarray(kernels.c2r_np(x))
    # planar (2, N) layout for the fused chains: the spliced fft2p
    # front end consumes these planes with zero device relayout
    xp = jnp.asarray(kernels.c2p_np(x))
    k = bank.k_max
    t2 = 1200                      # carried tail bits (frame.batch TAIL)

    res = {
        "n_carriers": n_carriers,
        "backend": jax.default_backend(),
        "block_s": block / fs,
        "steps": steps,
    }

    # ---- demod-only chain (round-1 metric, kept for comparability) ----
    # Measured AFTER the e2e headline in both-mode (see below): a cold
    # compile here once burned 25 min of the shared watchdog budget and
    # the headline degraded to classic (round-4 lesson, PERF_9f7dbe3).
    def chain_demod(x_r, state, n):
        def body(st, _):
            out, st2 = bank._step_impl(x_r, st)
            return st2, out["hard"][:, 0]
        st, tails = jax.lax.scan(body, state, None, length=n)
        return st, tails

    def run_demod():
        try:
            chain_j = jax.jit(chain_demod, static_argnums=2)
            elapsed = _time_chain(
                chain_j, lambda: (xd, bank.init_state(), steps), steps,
                lambda out: (np.asarray(out[0]["timing"]["next_t"])[0],
                             np.asarray(out[1])[-1, 0]))
            res["demod_rt_factor"] = steps * block / fs / elapsed
            res["demod_carriers_rt"] = (res["demod_rt_factor"]
                                        * n_carriers)
            res["demod_elapsed_s"] = elapsed
        except Exception as e:
            # both-mode: the demod-only comparison number must not cost
            # the e2e headline (r03 lesson: one failure zeroed the run)
            if mode == "demod":
                raise
            res.setdefault("degraded", []).append(
                f"demod: {type(e).__name__}: {e}"[:300])
            print(f"# bench ladder: demod-only chain failed, continuing"
                  f" ({type(e).__name__}: {e})", file=sys.stderr,
                  flush=True)

    if mode == "demod":
        run_demod()

    # ---- end-to-end chain: IQ -> sync + CRC verdicts everywhere ----
    # Fused path (dsp.backhalf): band synthesis + timing + DQPSK +
    # frame scan in two Pallas kernels — bit-identical verdict planes
    # to the classic chain (tests/unit/test_backhalf.py).  Classic XLA
    # chain kept behind BENCH_NO_FUSED=1 and for ineligible configs.
    fused = None
    if os.environ.get("BENCH_NO_FUSED") != "1":
        from tetraear_tpu.dsp.backhalf import try_fused
        # the bench measures the fused kernels in interpret mode on CPU
        # too (exactness smokes), so force past the backend check
        os.environ.setdefault("TETRAEAR_FORCE_FUSED", "1")
        fused, _reason = try_fused(bank)

    def chain_e2e_fused(x_r, state, n):
        from tetraear_tpu.dsp import framescan as fsmod
        off = fsmod.TS_OFFSET_BITS // 2

        def body(carry, _):
            st, nhit, nok = carry
            out, st2 = fused.step(x_r, st)
            hits = out["corr"] >= 0.90
            span = min(hits.shape[1] - off, out["crc_err"].shape[1])
            sync_al = jax.lax.slice_in_dim(hits, off, off + span, 1,
                                           axis=1)
            crc_al = jax.lax.slice_in_dim(out["crc_err"], 0, span, 1,
                                          axis=1)
            nhit = nhit + jnp.sum(hits.astype(jnp.int32))
            nok = nok + jnp.sum((sync_al & (crc_al <= 2))
                                .astype(jnp.int32))
            return (st2, nhit, nok), None

        init = (state, jnp.int32(0), jnp.int32(0))
        (st, nhit, nok), _ = jax.lax.scan(body, init, None, length=n)
        return st, nhit, nok

    def chain_e2e(x_r, state, tail, n):
        k2 = 2 * k

        def body(carry, _):
            st, tl, nhit, nok = carry
            out, st2 = bank._step_impl(x_r, st)
            hard = out["hard"]
            valid = out["valid"]
            n_c = jnp.sum(valid, axis=1)
            h = jnp.where(valid, hard, 0).astype(jnp.uint8)
            bits = jnp.repeat(h, 2, axis=1)
            bits = bits.at[:, 0::2].set(h >> 1)
            bits = bits.at[:, 1::2].set(h & 1)
            z = jnp.concatenate([tl, bits], axis=1)
            # even-position scan (frame starts are symbol-aligned);
            # element pe <-> bit position 2*pe
            scan = framescan.frame_scan_packed_even(z)
            hits = scan["corr"] >= 0.90
            # sync at p <-> frame start p-216: overlap of the two arrays
            off = framescan.TS_OFFSET_BITS // 2
            span = min(hits.shape[1] - off, scan["crc_err"].shape[1])
            sync_al = jax.lax.slice_in_dim(hits, off, off + span, 1,
                                           axis=1)
            crc_al = jax.lax.slice_in_dim(scan["crc_err"], 0, span, 1,
                                          axis=1)
            nhit = nhit + jnp.sum(hits.astype(jnp.int32))
            nok = nok + jnp.sum((sync_al & (crc_al <= 2)).astype(jnp.int32))
            tl2 = jax.lax.slice_in_dim(z, k2 - 4, k2 - 4 + t2, 1, axis=1)
            for d in (1, 2):
                cand = jax.lax.slice_in_dim(
                    z, k2 - 4 + 2 * d, k2 - 4 + 2 * d + t2, 1, axis=1)
                tl2 = jnp.where((n_c == k - 2 + d)[:, None], cand, tl2)
            return (st2, tl2, nhit, nok), None

        init = (state, tail, jnp.int32(0), jnp.int32(0))
        (st, tl, nhit, nok), _ = jax.lax.scan(body, init, None, length=n)
        return st, nhit, nok

    # ---- end-to-end WITH VOICE: every carrier treated as an active
    # call.  Per block the chain runs the fused demod+scan, the sparse
    # hit extraction (the production fetch path), then TWO voice slots
    # per carrier through the device channel decoder (jviterbi) and
    # FOUR speech frames through the device ACELP bank (jspeech) with
    # carried decoder state.  The final fetch depends on the PCM, the
    # sparse keys and the scan counters, so nothing is dead code.  This
    # is the reference CaptureThread's full voice path
    # (tetraear/ui/modern.py:2088-2228) at an all-carriers-active load.
    run_voice = None
    if mode in ("voice", "both") and fused is not None:
        from tetraear_tpu.dsp.framescan import sparse_hits, SPARSE_K
        from tetraear_tpu.voice import jviterbi, jspeech
        from tetraear_tpu.voice.etsi_tables import (
            TAB0, TAB1, TAB2)

        pos = np.concatenate([TAB0, TAB1, TAB2]) - 1     # (137,)
        inv = np.argsort(pos).astype(np.int32)           # inverse perm
        o1, o2 = 100, 500                                # slot offsets

        def unbuild(ordered, bfi):
            """(B, 286) ordered + (B,) bfi -> (B, 2, 138) traced."""
            fa = ordered[:, 2 * jnp.asarray(inv)]
            fb = ordered[:, 2 * jnp.asarray(inv) + 1]
            fr = jnp.stack([fa, fb], axis=1).astype(jnp.int32)
            b = jnp.broadcast_to(bfi[:, None, None].astype(jnp.int32),
                                 (fr.shape[0], 2, 1))
            return jnp.concatenate([b, fr], axis=2)      # (B, 2, 138)

        def chain_voice(x_r, state, sstate, n):
            from tetraear_tpu.dsp import framescan as fsmod
            off = fsmod.TS_OFFSET_BITS // 2

            def body(carry, _):
                st, sst, nhit, nok, pacc = carry
                out, st2 = fused.step(x_r, st)
                hits = out["corr"] >= 0.90
                span = min(hits.shape[1] - off,
                           out["crc_err"].shape[1])
                sync_al = jax.lax.slice_in_dim(hits, off, off + span,
                                               1, axis=1)
                crc_al = jax.lax.slice_in_dim(out["crc_err"], 0, span,
                                              1, axis=1)
                nhit = nhit + jnp.sum(hits.astype(jnp.int32))
                nok = nok + jnp.sum((sync_al & (crc_al <= 2))
                                    .astype(jnp.int32))
                keys, counts = sparse_hits(out["corr"], out["crc_err"],
                                           SPARSE_K)
                # two 216-symbol voice slots per carrier -> (2C, 432)
                soft = fused.soft_symbols(out["soft_planes"])
                s1 = jax.lax.slice_in_dim(soft, o1, o1 + 216, 1, axis=1)
                s2 = jax.lax.slice_in_dim(soft, o2, o2 + 216, 1, axis=1)
                sb = jnp.concatenate([s1, s2], axis=0)
                sb = jnp.round(sb.reshape(sb.shape[0], 432)
                               * 127.0).astype(jnp.int32)
                ordered, bfi = jviterbi.channel_decode_batch_traced(sb)
                fr1 = unbuild(ordered[:n_carriers], bfi[:n_carriers])
                fr2 = unbuild(ordered[n_carriers:], bfi[n_carriers:])
                frames = jnp.concatenate([fr1, fr2], axis=1)  # (C,4,138)
                valid = jnp.ones((n_carriers, 4), bool)
                sst2, pcm = jspeech.decode_block(sst, frames, valid)
                pacc = pacc + jnp.sum(pcm[:, :, 0].astype(jnp.int32))
                pacc = pacc + keys[0, 0] + counts[0]
                return (st2, sst2, nhit, nok, pacc), None

            init = (state, sstate, jnp.int32(0), jnp.int32(0),
                    jnp.int32(0))
            (st, sst, nhit, nok, pacc), _ = jax.lax.scan(
                body, init, None, length=n)
            return st, nhit, nok, pacc

        def run_voice():
            chain_j = jax.jit(chain_voice, static_argnums=3)
            sstate0 = jspeech.init_state(n_carriers)
            try:
                elapsed = _time_chain(
                    chain_j,
                    lambda: (xp, fused.init_state(), sstate0, steps),
                    steps,
                    lambda out: (
                        np.asarray(
                            out[0]["bank"]["timing"]["next_t"])[0],
                        int(out[1]), int(out[2]), int(out[3])))
                res["voice_rt_factor"] = steps * block / fs / elapsed
                res["voice_carriers_rt"] = (res["voice_rt_factor"]
                                            * n_carriers)
                res["voice_elapsed_s"] = elapsed
                from tetraear_tpu.runtime.profiling import voice_roofline
                res["voice_model"] = voice_roofline(
                    n_carriers, block / fs,
                    rt_factor=res["voice_rt_factor"])
            except Exception as e:
                # in both-mode the voice add-on must not nuke the e2e
                # headline (it shares the bench watchdog budget; a TPU
                # worker crash here still loses the run — which is why
                # both-mode measures e2e FIRST)
                if mode == "voice":
                    raise
                res["voice_error"] = f"{type(e).__name__}: {e}"

    if mode == "voice":
        if run_voice is not None:
            run_voice()
        if "voice_rt_factor" not in res:
            raise RuntimeError("voice bench mode needs the fused path")
        elapsed = res["voice_elapsed_s"]
        res["rt_factor"] = res["voice_rt_factor"]
        res["carriers_rt"] = res["voice_carriers_rt"]
        res["elapsed_s"] = elapsed
        res["input_msps"] = steps * block / elapsed / 1e6
        from tetraear_tpu.runtime.profiling import roofline_fraction
        res["roofline"] = roofline_fraction(
            n_carriers, fs, res["rt_factor"], frontend=frontend)
        return res

    if mode in ("e2e", "both"):
        # degrade ladder (VERDICT r03 item 3): a broken fused kernel
        # must cost the fused premium, not the whole headline
        ladder = (["fused"] if fused is not None else []) + ["classic"]
        elapsed = None
        errors = []
        for variant in ladder:
            try:
                if variant == "fused":
                    chain_j = jax.jit(chain_e2e_fused, static_argnums=2)
                    elapsed = _time_chain(
                        chain_j, lambda: (xp, fused.init_state(), steps),
                        steps,
                        lambda out: (
                            np.asarray(
                                out[0]["bank"]["timing"]["next_t"])[0],
                            int(out[1]), int(out[2])))
                else:
                    chain_j = jax.jit(chain_e2e, static_argnums=3)
                    tail0 = jnp.zeros((n_carriers, t2), jnp.uint8)
                    elapsed = _time_chain(
                        chain_j,
                        lambda: (xd, bank.init_state(), tail0, steps),
                        steps,
                        lambda out: (
                            np.asarray(out[0]["timing"]["next_t"])[0],
                            int(out[1]), int(out[2])))
                break
            except Exception as e:
                msg = f"e2e-{variant}: {type(e).__name__}: {e}"[:300]
                errors.append(msg)
                print(f"# bench ladder: {msg}", file=sys.stderr,
                      flush=True)
                if variant == "fused":
                    fused = None       # voice add-on needs fused too
        if elapsed is None:
            raise RuntimeError("every e2e ladder variant failed: "
                               + " | ".join(errors))
        if errors:
            res.setdefault("degraded", []).extend(errors)
        res["e2e_variant"] = variant
        res["rt_factor"] = steps * block / fs / elapsed
        res["carriers_rt"] = res["rt_factor"] * n_carriers
        res["elapsed_s"] = elapsed
        res["input_msps"] = steps * block / elapsed / 1e6
        from tetraear_tpu.runtime.profiling import roofline_fraction
        res["roofline"] = roofline_fraction(
            n_carriers, fs, res["rt_factor"], frontend=frontend)
        # secondary metrics AFTER the headline is banked (neither a
        # failure nor a cold compile here may cost the e2e number);
        # opt out of voice with BENCH_VOICE=0
        if mode == "both":
            run_demod()
        if (mode == "both" and run_voice is not None
                and fused is not None
                and os.environ.get("BENCH_VOICE") != "0"):
            run_voice()
    elif mode == "demod":
        res["rt_factor"] = res["demod_rt_factor"]
        res["carriers_rt"] = res["demod_carriers_rt"]
        res["elapsed_s"] = res["demod_elapsed_s"]
        res["input_msps"] = steps * block / res["elapsed_s"] / 1e6
    return res


def main():
    # Default to the best-evidenced max-throughput configuration:
    # C=20480 (nfft 2^26) is both faster AND genuinely concurrent —
    # rt_factor > 1 means the chip demonstrably sustains all 20,480
    # carriers simultaneously, so the headline is no longer an
    # extrapolation from a smaller geometry (round-4 verdict item 3;
    # per-carrier efficiency IMPROVES ~4.5% over C=10240).  C=1024
    # finishes in ~0.2 s and shows ±10% run-to-run variance; C=10240
    # remains the breakdown/ablation geometry.
    n_carriers = int(os.environ.get("BENCH_CARRIERS", "20480"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    frontend = os.environ.get("BENCH_FRONTEND", "fft")
    mode = os.environ.get("BENCH_MODE", "both")
    # 2700s default: one cold fused-chain compile through the relay
    # measured ~25 min (round 4) — 1500s lost the headline to the
    # classic rung purely on compile time when the kernel cache missed
    budget_s = int(os.environ.get("BENCH_TIMEOUT_S", "2700"))

    # Watchdog: a hung remote compile must not hang the harness; raising
    # in-process lets the PJRT client unwind and release its device grant
    # (a hard kill wedges the TPU for subsequent users).
    import signal

    def _alarm(signum, frame):
        raise TimeoutError(f"bench exceeded {budget_s}s budget")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(budget_s)
    unit = ("realtime carriers (25 kHz pi/4-DQPSK, IQ->sync+CRC-checked "
            "frames on device)")
    # BENCH_r03 post-mortem: the round-3 run died INSIDE a relay compile
    # with rc=0 and no JSON on stdout — the except-path guard below never
    # ran (or its output was lost unflushed).  Two defenses: stdout goes
    # line-buffered so anything printed survives an abrupt exit, and a
    # bootstrap zero line goes out FIRST — harness parsers take the LAST
    # JSON line, so a successful run supersedes it, while a hard death
    # mid-compile still leaves a parseable, honest zero.
    try:
        sys.stdout.reconfigure(line_buffering=True)
    except Exception:
        pass
    print(json.dumps({
        "metric": "realtime_tetra_carriers_per_chip", "value": 0.0,
        "unit": unit, "vs_baseline": 0.0,
        "degraded": "bootstrap sentinel: bench died before reporting",
    }), flush=True)
    try:
        try:
            r = run_bench(n_carriers=n_carriers, steps=steps,
                          frontend=frontend, mode=mode)
        except Exception as e:
            # last ladder rung: the conv frontend on a fresh bank
            if frontend == "conv" or mode == "voice":
                raise
            print(f"# bench ladder: {frontend} frontend bank failed "
                  f"({type(e).__name__}: {e}); retrying frontend=conv",
                  file=sys.stderr, flush=True)
            r = run_bench(n_carriers=n_carriers, steps=steps,
                          frontend="conv", mode=mode)
            r.setdefault("degraded", []).insert(
                0, f"frontend-{frontend}: {type(e).__name__}: {e}"[:300])
        signal.alarm(0)
        value = r["carriers_rt"]
        line = {
            "metric": "realtime_tetra_carriers_per_chip",
            "value": round(float(value), 1),
            "unit": unit,
            "vs_baseline": round(float(value) / 1.0, 1),
            # value is capacity (rt_factor x C, the per-carrier rate
            # extrapolated to a full chip); concurrent_carriers is the
            # DEMONSTRATED realtime simultaneous count — the C actually
            # in the program, and ONLY when rt_factor >= 1 (round-4
            # verdict item 3: the strongest claim must be the evidenced
            # one).  At rt < 1 nothing ran in realtime, so the field is
            # 0 — min(C, value) would smuggle the extrapolation back in
            # under the 'demonstrated' label.
            "concurrent_carriers": (int(r["n_carriers"])
                                    if float(r.get("rt_factor", 0.0))
                                    >= 1.0 else 0),
            "rt_factor": round(float(r.get("rt_factor", 0.0)), 3),
        }
        if "degraded" in r:
            line["degraded"] = r["degraded"]
        if "e2e_variant" in r:
            line["e2e_variant"] = r["e2e_variant"]
        if "demod_carriers_rt" in r and mode == "both":
            line["demod_only_carriers"] = round(
                float(r["demod_carriers_rt"]), 1)
        if "voice_carriers_rt" in r:
            line["voice_carriers_rt"] = round(
                float(r["voice_carriers_rt"]), 1)
        if "voice_model" in r:
            vm = r["voice_model"]
            line["voice_model_carriers_rt"] = round(
                float(vm["model_voice_carriers_rt"]), 1)
            line["voice_model_pct"] = round(
                float(vm.get("voice_model_pct", 0.0)), 1)
        if "roofline" in r:
            line["roofline_pct"] = round(r["roofline"]["roofline_pct"], 2)
            line["roofline_measured_pct"] = round(
                r["roofline"].get("roofline_measured_pct",
                                  r["roofline"]["roofline_pct"]), 2)
            if "measured_gbs" in r["roofline"]:
                line["measured_gbs"] = r["roofline"]["measured_gbs"]
                line["measured_gbs_source"] = \
                    r["roofline"]["measured_gbs_source"]
        print(json.dumps(line), flush=True)
        extra = (f" demod_only={r['demod_carriers_rt']:.0f}"
                 if "demod_carriers_rt" in r else "")
        if "roofline" in r:
            rl = r["roofline"]
            extra += (f" roofline={rl['roofline_pct']:.1f}%"
                      f" ({rl['bound']}-bound model:"
                      f" {rl['achieved_tflops']:.2f} TF/s,"
                      f" {rl['achieved_gbs']:.0f} GB/s)")
        print(f"# backend={r['backend']} n_carriers={r['n_carriers']} "
              f"rt_factor={r['rt_factor']:.1f} input={r['input_msps']:.0f} "
              f"Msps elapsed={r['elapsed_s']:.2f}s steps={steps}{extra}",
              file=sys.stderr)
    except Exception as e:
        print(json.dumps({
            "metric": "realtime_tetra_carriers_per_chip",
            "value": 0.0,
            "unit": unit,
            "vs_baseline": 0.0,
            "degraded": f"fatal: {type(e).__name__}: {e}"[:300],
        }), flush=True)
        sys.stdout.flush()
        print(f"# bench failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)
        raise SystemExit(0)


if __name__ == "__main__":
    main()
