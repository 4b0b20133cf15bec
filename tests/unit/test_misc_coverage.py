"""Coverage for small paths: profiler, checkpoint errors, CLI scan."""

import numpy as np
import pytest


def test_profiler_context(tmp_path):
    import jax.numpy as jnp
    from tetraear_tpu.runtime.profiling import Profiler
    with Profiler(tmp_path / "trace"):
        _ = jnp.ones(16) * 2
    assert any((tmp_path / "trace").rglob("*"))


def test_checkpoint_mismatch_raises(tmp_path):
    from tetraear_tpu.runtime import checkpoint
    import jax.numpy as jnp
    state = {"a": jnp.ones(4), "b": jnp.zeros(2)}
    checkpoint.save_state(tmp_path / "s.npz", state)
    leaves, extra, _aux = checkpoint.load_state(tmp_path / "s.npz")
    with pytest.raises(ValueError):
        checkpoint.restore_into({"a": jnp.ones(4)}, leaves)
    restored = checkpoint.restore_into(state, leaves)
    assert np.array_equal(np.asarray(restored["a"]), np.ones(4))

    # same leaf COUNT but different structure -> treedef mismatch error
    other = {"x": jnp.ones(4), "y": jnp.zeros(2)}
    with pytest.raises(ValueError, match="tree structure"):
        checkpoint.restore_into(other, leaves,
                                saved_treedef=extra["__treedef__"])
    # same structure but different shapes -> descriptive shape error
    shaped = {"a": jnp.ones(8), "b": jnp.zeros(2)}
    with pytest.raises(ValueError, match="configuration mismatch"):
        checkpoint.restore_into(shaped, leaves)


def test_afc_retune_applies_offset():
    """Capture-level AFC must act: past the threshold the source is
    retuned and the offset folds into the displayed frequency."""
    from tetraear_tpu.api import Pipeline, PipelineConfig
    from tetraear_tpu.runtime import sources

    cfg = PipelineConfig(carrier_offsets_hz=(12_500.0,), afc=True,
                         afc_retune_hz=500.0, voice=False, validate=False,
                         detect_gate=False, frequency=392.5e6)
    pipe = Pipeline(cfg)
    src = sources.SyntheticTetraSource(sample_rate=2.4e6, snr_db=30,
                                       seed=1)
    pipe._afc_offset = 3_000.0           # as if the FFT peak drifted
    retunes = []
    src.set_frequency = lambda f: retunes.append(f)
    pipe._maybe_afc_retune(src)
    assert retunes and abs(retunes[0] - 392.503e6) < 1.0
    assert abs(pipe.config.frequency - 392.503e6) < 1.0
    assert pipe._afc_offset == 0.0


@pytest.mark.slow
def test_cli_scan_step_mode(capsys, monkeypatch):
    """CLI scan (step mode) against a synthetic capture source."""
    from tetraear_tpu import cli
    from tetraear_tpu.runtime import sources

    class FakeCap(sources.IQSource):
        def __init__(self, *a, **k):
            super().__init__(frequency=392.5e6, sample_rate=2.4e6)
            self._synth = sources.SyntheticTetraSource(
                sample_rate=2.4e6, snr_db=25, seed=4)

        def read_samples(self, n):
            if abs(self.frequency - 392.5e6) < 12_500:
                return self._synth.read_samples(n)
            rng = np.random.default_rng(1)
            return 0.001 * (rng.standard_normal(n)
                            + 1j * rng.standard_normal(n)).astype(
                                np.complex64)

    monkeypatch.setattr(sources, "open_source",
                        lambda *a, **k: FakeCap())
    monkeypatch.setattr(cli, "_open_source",
                        lambda args: FakeCap())
    rc = cli.main(["scan", "392.475", "392.525", "-s", "2.4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "392.5000" in out



def test_make_host_mesh_layout():
    """runtime.distributed.make_host_mesh keeps the time axis inside a
    host (ICI) and puts carriers on the outer axis."""
    import jax
    from tetraear_tpu.runtime import distributed
    mesh = distributed.make_host_mesh(carriers_per_host=2)
    n = len(jax.devices())
    assert mesh.shape["carrier"] * mesh.shape["time"] <= n
    assert mesh.shape["carrier"] >= 2
    # usable by the sharded demod
    from tetraear_tpu.runtime.sharding import ShardedDemod
    offs = [12_500.0 * (i + 1) for i in range(mesh.shape["carrier"])]
    sd = ShardedDemod(fs=2.4e6, freqs_hz=offs, mesh=mesh,
                      seg_len=4_800 * mesh.shape["time"] //
                      mesh.shape["time"])
    assert sd.n_carriers == mesh.shape["carrier"]
