"""Hardware AOT-compile gate for every Pallas-bearing production graph.

Round-3 lesson (VERDICT r03 items 1-2): the CPU suite runs Pallas in
interpret mode, which validates semantics but NOT Mosaic lowering — a
kernel-touching commit landed with a `vector<32xf32> -> vector<32x1x1xf32>`
reshape Mosaic rejects, and the failure surfaced only in the end-of-round
bench.  This gate AOT-compiles (compile ONLY — no data upload, no
execution) each production graph at bench shapes on the real chip:

    backhalf    pallas_kernels.fused_backhalf at group/TETRAEAR_BH_GROUP,
                C=GATE_CARRIERS geometry
    chanraw     FusedRx.chan_raw — fft2p pass1/pass2 + band_synth +
                band extraction at the same geometry
    step        the full fused production block step (the graph bench.py
                and api.Pipeline dispatch every block)
    framescan   frame_scan_even at the classic-path z layout (the
                fallback ladder's scan kernel)
    classic     bank._step_impl — the classic fallback chain

Rule (CLAUDE.md): no commit that touches tetraear_tpu/dsp/pallas_kernels.py
(or the shapes feeding it) lands without this gate green on hardware.

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/gate_kernels.py
Env: GATE_CARRIERS (10240), GATE_KERNELS (comma list, default all),
     GATE_TIMEOUT_S (900).
Prints ONE JSON line: {"metric": "kernel_gate", "pass": N, "fail": N,
"kernels": {name: {"ok": bool, "elapsed_s": s, ["error": tail]}}};
exit 0 iff every selected target compiled.
"""

import json
import os
import signal
import sys
import time


def main() -> int:
    budget = int(os.environ.get("GATE_TIMEOUT_S", "900"))
    signal.signal(signal.SIGALRM,
                  lambda *a: (_ for _ in ()).throw(
                      TimeoutError(f"gate exceeded {budget}s")))
    signal.alarm(budget)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import _make_bank
    from tetraear_tpu.dsp import framescan
    from tetraear_tpu.dsp import pallas_kernels as pk
    from tetraear_tpu.dsp.backhalf import FusedRx, TAILBITS

    c_n = int(os.environ.get("GATE_CARRIERS", "20480"))
    group = int(os.environ.get("TETRAEAR_BH_GROUP", "32"))
    print(f"# gate: backend={jax.default_backend()} C={c_n} "
          f"group={group}", flush=True)

    bank, fs = _make_bank(c_n, None, "fft")
    fused = FusedRx(bank)
    ch = fused.ch
    p = fused.p
    f32 = jnp.float32

    def s(shape, dtype=f32):
        return jax.ShapeDtypeStruct(shape, dtype)

    x_s = s((2, bank.block_len))     # planar: the fused-path layout
    x_cl = s((bank.block_len, 2))    # interleaved: the classic layout
    state_s = jax.eval_shape(fused.init_state)
    k3, rsyn, c0row = framescan._PALLAS_TABLES

    def gate_backhalf():
        # fused_backhalf is a non-jitted env-resolving wrapper (round-5
        # advisor fix); jit it fresh so .lower works and the current
        # env resolution is what gets compiled
        jax.jit(pk.fused_backhalf,
                static_argnames=("drop", "k_max", "group",
                                 "interpret")).lower(
            s((c_n, 2, 128, p)), s((c_n, 10, 128)),
            s((c_n, 2, 128, 1)), s((c_n, 2, 1, p)), s((c_n, 16)),
            s((c_n,), jnp.int32), s((c_n,), jnp.int32),
            s(k3.shape), s(rsyn.shape), s(c0row.shape),
            drop=ch.drop, k_max=fused.k_max, group=group,
            interpret=False).compile()

    def gate_chanraw():
        jax.jit(fused.chan_raw).lower(
            x_s, state_s["bank"]["channelizer"]).compile()

    def gate_step():
        jax.jit(fused.step).lower(x_s, state_s).compile()

    def gate_framescan():
        n_z = TAILBITS + 2 * bank.k_max
        jax.jit(framescan.frame_scan_packed_even).lower(
            s((c_n, n_z), jnp.uint8)).compile()

    def gate_classic():
        jax.jit(bank._step_impl).lower(
            x_cl, jax.eval_shape(bank.init_state)).compile()

    targets = {
        "backhalf": gate_backhalf,
        "chanraw": gate_chanraw,
        "step": gate_step,
        "framescan": gate_framescan,
        "classic": gate_classic,
    }
    sel = os.environ.get("GATE_KERNELS", "")
    names = [n for n in sel.split(",") if n] if sel else list(targets)
    unknown = [n for n in names if n not in targets]
    if unknown:
        raise SystemExit(f"unknown gate kernels {unknown}; "
                         f"choose from {sorted(targets)}")

    out = {}
    for name in names:
        t0 = time.time()
        try:
            targets[name]()
            out[name] = {"ok": True,
                         "elapsed_s": round(time.time() - t0, 1)}
        except Exception as e:  # noqa: BLE001 — per-kernel verdicts
            out[name] = {"ok": False,
                         "elapsed_s": round(time.time() - t0, 1),
                         "error": f"{type(e).__name__}: {e}"[-800:]}
        print(f"# {name}: {'PASS' if out[name]['ok'] else 'FAIL'} "
              f"({out[name]['elapsed_s']}s)", flush=True)

    n_ok = sum(1 for v in out.values() if v["ok"])
    print(json.dumps({"metric": "kernel_gate", "pass": n_ok,
                      "fail": len(out) - n_ok, "carriers": c_n,
                      "group": group, "kernels": out}), flush=True)
    return 0 if n_ok == len(out) else 1


if __name__ == "__main__":
    raise SystemExit(main())
