"""Streaming runners: dispatch-efficient block processing.

The interactive Pipeline (tetraear_tpu.api) issues one jitted step per
block — right for real-time sources, wasteful for offline decode through
the axon relay (~5 ms fixed dispatch latency per call, CLAUDE.md rule 4).
``scan_run`` fuses S blocks into ONE device program with ``lax.scan``
carrying the demod state, so offline captures decode at device speed and
the per-dispatch overhead amortizes S-fold.  This is also exactly the
shape bench.py measures.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from tetraear_tpu.dsp import kernels


class ScanRunner:
    """Process many blocks per device dispatch via lax.scan."""

    def __init__(self, bank, blocks_per_dispatch: int = 16):
        self.bank = bank
        self.s = int(blocks_per_dispatch)
        self._scan = jax.jit(self._scan_impl)

    def _scan_impl(self, xs_r, state):
        def body(st, x_r):
            out, st2 = self.bank._step_impl(x_r, st)
            return st2, (out["hard"], out["soft"], out["valid"])
        state, (hard, soft, valid) = jax.lax.scan(body, state, xs_r)
        return state, hard, soft, valid

    def run(self, iq: np.ndarray, state=None) -> dict:
        """Decode a capture in S-block dispatches.

        Returns per-carrier symbol/soft streams (same layout as
        CarrierBankDemod.run) plus the final carried state.
        """
        iq = np.asarray(iq, np.complex64)
        bl = self.bank.block_len
        fresh = state is None
        state = state if state is not None else self.bank.init_state()
        c = self.bank.n_carriers
        hards = [[] for _ in range(c)]
        softs = [[] for _ in range(c)]
        # drop the first differential output only on a fresh state (it
        # references the zero-filled initial prev symbol)
        first_block = fresh

        pos = 0
        while pos + bl <= len(iq):
            take = min(self.s, (len(iq) - pos) // bl)
            xs = iq[pos:pos + take * bl].reshape(take, bl)
            xs_r = jnp.asarray(kernels.c2r_np(xs))
            state, hard, soft, valid = self._scan(xs_r, state)
            hard = np.asarray(hard)      # (take, C, K)
            soft = np.asarray(soft)
            valid = np.asarray(valid).astype(bool)
            for b in range(take):
                for ci in range(c):
                    h = hard[b, ci][valid[b, ci]]
                    s = soft[b, ci][valid[b, ci]]
                    if first_block:
                        h, s = h[1:], s[1:]
                    hards[ci].append(h)
                    softs[ci].append(s)
                first_block = False
            pos += take * bl
        return {
            "symbols": [np.concatenate(h) if h else np.zeros(0, np.uint8)
                        for h in hards],
            "soft_bits": [np.concatenate(s) if s else
                          np.zeros((0, 2), np.float32) for s in softs],
            "state": state,
        }
