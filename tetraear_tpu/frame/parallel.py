"""Carrier-sharded per-hit frame layer over worker processes.

The per-hit host path is embarrassingly parallel over carriers: every
piece of its state (MacParser fragmentation, SYSINFO identity, the
emitted-frame dedup watermark) is per-carrier.  This module shards the
STATEFUL pass-2 (frame.batch.decode_candidates — MAC application, SDS,
frame dicts) across spawn-based worker processes while the parent keeps
everything vectorized: tail assembly, sync cascade, candidate window
collection and the native hitparse batch call (~1 us/frame).

Per-block IPC is O(hits): each candidate ships as (carrier, start,
abs_sym, 510-bit window, HitPre) — ~1 KB pickled — and each decoded
frame dict returns the same way.  soft_symbols are attached by the
PARENT from its assembled soft planes, so the bulky (C, W, 2) float
arrays never cross a process boundary.

Division of labour (docs/ARCHITECTURE.md "host envelope"): one parent
core feeds N worker cores; throughput scales with workers until the
parent's vectorized collection (~1-3 us/frame) saturates.

Workers never import JAX (frame.decoder / frame.batch are NumPy-only
at import time); deferred decryption returns to the parent as
``decryption_pending`` frames and is finished there with ONE device
keys x payloads search per block (crypto.batch), exactly like the
in-process layer.

Equivalence with the in-process BatchedFrameDecoder is pinned by
tests/unit/test_parallel_frames.py.
"""

from __future__ import annotations

import multiprocessing as mp

import numpy as np

from tetraear_tpu.frame.decoder import TetraDecoder
from tetraear_tpu.frame.batch import (BatchedFrameDecoder, TAIL_SYMS,
                                      decode_candidates)


class _LazyDecoders:
    """Per-carrier TetraDecoder map, constructed on first use."""

    def __init__(self, key_file=None, auto_decrypt=True, keys=()):
        self._m: dict = {}
        self._key_file = key_file
        self._auto = auto_decrypt
        self._keys = tuple(keys)

    def _make(self):
        km = None
        if self._key_file:
            from tetraear_tpu.crypto.tea import TetraKeyManager
            km = TetraKeyManager()
            km.load_key_file(self._key_file)
        d = TetraDecoder(key_manager=km, auto_decrypt=self._auto)
        d.defer_decrypt = True
        if self._keys:
            d.set_keys(list(self._keys))
        return d

    def __getitem__(self, ci: int) -> TetraDecoder:
        d = self._m.get(ci)
        if d is None:
            d = self._m[ci] = self._make()
        return d


class _Emitted(dict):
    """Sparse emitted_until watermark map (missing carrier -> 0)."""

    def __missing__(self, key):
        return 0


def _worker_main(conn, key_file, auto_decrypt, keys):
    decoders = _LazyDecoders(key_file, auto_decrypt, keys)
    emitted = _Emitted()
    while True:
        msg = conn.recv()
        if msg is None:
            conn.close()
            return
        meta, wins, hb, hints = msg
        cands = [(ci, start, abs_sym, wins[i])
                 for i, (ci, start, abs_sym) in enumerate(meta)]
        try:
            frames = decode_candidates(decoders, emitted, cands, hb,
                                       list(hints))
            for f in frames:
                # the parent holds the window matrix; it reattaches
                # "bits" by (carrier, position) — don't pickle 510-byte
                # arrays back per frame
                f.pop("bits", None)
        except Exception:                       # propagate with context
            import traceback
            conn.send(("err", traceback.format_exc()))
            continue
        conn.send(("ok", frames))


class ShardedFrameLayer:
    """Drop-in BatchedFrameDecoder with pass-2 sharded over workers.

    Same process(hard, soft, valid) / select_and_decode interface and
    identical output frames (ordering: carrier-ascending, as shards
    are contiguous carrier ranges merged in order).
    """

    def __init__(self, n_carriers: int, n_workers: int = 2,
                 key_file=None, key_manager=None, auto_decrypt=True,
                 keys=(), tail_syms: int = TAIL_SYMS):
        if key_manager is not None:
            raise ValueError(
                "ShardedFrameLayer cannot ship a live TetraKeyManager to "
                "worker processes; pass key_file= and/or keys= instead")
        # parent-side vectorized bookkeeping reuses BatchedFrameDecoder
        # (its per-carrier decoders stay UNUSED in pass 2; the parent
        # only runs assemble/collection + the decrypt finishing)
        self._inner = BatchedFrameDecoder(
            n_carriers,
            decoders=_LazyDecoders(key_file, auto_decrypt, keys),
            key_manager=key_manager, auto_decrypt=auto_decrypt,
            tail_syms=tail_syms)
        self.n_carriers = n_carriers
        self.n_workers = max(1, int(n_workers))
        bounds = np.linspace(0, n_carriers, self.n_workers + 1).astype(int)
        self._bounds = bounds
        self._spawn_args = (key_file, auto_decrypt, tuple(keys))
        self._ctx = mp.get_context("spawn")
        self._conns = [None] * self.n_workers
        self._procs = [None] * self.n_workers
        for w in range(self.n_workers):
            self._spawn(w)
        # parent-side decrypt finishing needs the same key config
        self._decrypt_template = _LazyDecoders(key_file, auto_decrypt,
                                               keys)

    def _spawn(self, w: int) -> None:
        pc, cc = self._ctx.Pipe()
        p = self._ctx.Process(target=_worker_main,
                              args=(cc,) + self._spawn_args,
                              daemon=True)
        p.start()
        cc.close()
        self._conns[w] = pc
        self._procs[w] = p

    # -- lifecycle -----------------------------------------------------

    def close(self):
        for c in self._conns:
            try:
                c.send(None)
            except (BrokenPipeError, OSError):
                pass
        for p in self._procs:
            p.join(timeout=10)
        self._conns, self._procs = [], []

    def __del__(self):  # best-effort
        try:
            self.close()
        except Exception:
            pass

    # -- the sharded block step -----------------------------------------

    def select_and_decode(self, syms, softs, n_valid, valid_start_bits,
                          corr, crc_err) -> list:
        from tetraear_tpu.frame import hitparse
        inner = self._inner

        # pass 1 (parent, vectorized helpers): candidate collection —
        # the exact BatchedFrameDecoder gates
        cands = inner.collect_candidates(syms, n_valid, valid_start_bits,
                                         corr)
        hb = (hitparse.parse_windows(np.stack([c[3] for c in cands]))
              if cands and hitparse.available() else None)
        hints = [bool(crc_err[ci, start // inner.scan_stride] <= 2)
                 for ci, start, _a, _w in cands]

        # shard by carrier range; the wire format is array-batched
        # (one (N, 510) window matrix + one HitBatch subset per worker)
        # because pickle cost is per-object, not per-byte
        shard_idx = [[] for _ in range(self.n_workers)]
        for i, (ci, *_rest) in enumerate(cands):
            w = int(np.searchsorted(self._bounds[1:], ci, side="right"))
            shard_idx[w].append(i)
        win_by_pos = {}
        busy = []
        for w, idx in enumerate(shard_idx):
            if not idx:
                continue
            meta = []
            rows = []
            for i in idx:
                ci, start, abs_sym, win = cands[i]
                meta.append((ci, start, abs_sym))
                rows.append(win)
                win_by_pos[(ci, start)] = win
            hb_sub = hb.subset(idx) if hb is not None else None
            sub_hints = np.asarray([hints[i] for i in idx], bool)
            msg = (meta, np.stack(rows), hb_sub, sub_hints)
            try:
                self._conns[w].send(msg)
            except (BrokenPipeError, OSError):
                # dead worker noticed at send time: respawn first
                import logging
                logging.getLogger(__name__).warning(
                    "frame worker %d pipe broken; respawning", w)
                self._spawn(w)
                self._conns[w].send(msg)
            busy.append((w, msg))

        frames_out = []
        for w, msg in busy:
            try:
                status, payload = self._conns[w].recv()
            except (EOFError, ConnectionResetError):
                # the worker process DIED (OOM kill, crash).  Recovery
                # (SURVEY.md section 5.3): respawn and replay the block.
                # Shard-local MacParser state resets — in-flight
                # fragment chains on those carriers are lost (same
                # bound as a reference restart) — but no duplicate
                # frames: the parent's emitted watermark pre-filters
                # collection.
                import logging
                logging.getLogger(__name__).warning(
                    "frame worker %d died; respawning and replaying "
                    "the block", w)
                try:
                    self._procs[w].join(timeout=5)
                except Exception:
                    pass
                self._spawn(w)
                self._conns[w].send(msg)
                status, payload = self._conns[w].recv()
            if status != "ok":
                raise RuntimeError(
                    f"frame worker {w} failed:\n{payload}")
            frames_out.extend(payload)
        frames_out.sort(key=lambda f: (f["carrier"], f["position"]))
        for f in frames_out:
            f["bits"] = win_by_pos[(f["carrier"], f["position"])]

        # parent-side bookkeeping: the dedup watermark is reproducible
        # from the emitted frames, so the parent copy stays exact
        for f in frames_out:
            inner._emitted_until[f["carrier"]] = max(
                inner._emitted_until[f["carrier"]],
                f["stream_symbol"] + 255)
            ci, start = f["carrier"], f["position"]
            f["soft_symbols"] = softs[ci, start // 2:start // 2 + 255]

        if any(f.get("decryption_pending") for f in frames_out):
            from tetraear_tpu.crypto.batch import batch_decrypt_frames
            batch_decrypt_frames(self._decrypt_template, frames_out)
        return frames_out

    # -- BatchedFrameDecoder-compatible surface --------------------------

    @property
    def scan_stride(self):
        return self._inner.scan_stride

    @property
    def T(self):
        return self._inner.T

    @property
    def kernel(self):
        return self._inner.kernel

    @property
    def _sym_base(self):
        return self._inner._sym_base

    @_sym_base.setter
    def _sym_base(self, v):
        self._inner._sym_base = v

    @property
    def _first(self):
        return self._inner._first

    @_first.setter
    def _first(self, v):
        self._inner._first = v

    @property
    def _emitted_until(self):
        # checkpoint surface (api.Pipeline.save/load_checkpoint); the
        # parent copy is authoritative — collect_candidates pre-filters
        # against it before anything reaches a worker
        return self._inner._emitted_until

    @_emitted_until.setter
    def _emitted_until(self, v):
        self._inner._emitted_until = v

    def assemble(self, hard, soft, valid):
        return self._inner.assemble(hard, soft, valid)

    def process(self, hard, soft, valid) -> list:
        # one shared implementation: BatchedFrameDecoder.process only
        # touches assemble/kernel/select_and_decode/_sym_base/T, all of
        # which this class provides (select_and_decode is the sharded
        # one), so the canonical body runs unmodified
        return BatchedFrameDecoder.process(self, hard, soft, valid)
