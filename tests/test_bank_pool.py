"""Unit tests for the rotating scene-bank pool (data/bank_pool.py).

The pool guards invariants the long rotation runs depend on: the
held-out seed 99 must never enter a training bank, crash-consistent
adoption of a persistent pool dir, bounded eviction, and renderer
failures retrying instead of aborting training.
"""

import pathlib
import subprocess
import sys

import pytest

from fastposecnn_tpu.data.bank_pool import BankPool


def make_pool(root: pathlib.Path, **kw) -> BankPool:
    kw.setdefault("scene_count", 2)
    kw.setdefault("height", 32)
    kw.setdefault("width", 32)
    kw.setdefault("num_classes", 7)
    kw.setdefault("max_instances", 2)
    kw.setdefault("pose_cues", False)
    return BankPool(root, **kw)


def fake_render(pool: BankPool, script: str) -> None:
    """Replace the nocs_writer subprocess with a tiny inline script
    (receives the --out dir as argv[1])."""

    def _command(out_dir, seed):
        return [sys.executable, "-c", script, str(out_dir)]

    pool._command = _command


OK_SCRIPT = (
    "import sys, pathlib; d = pathlib.Path(sys.argv[1]);"
    "d.mkdir(parents=True); (d / 'scene.png').write_bytes(b'x')"
)
FAIL_SCRIPT = "import sys; sys.exit(3)"


class TestAdoption:
    def test_adopts_completed_banks_and_clears_partials(self, tmp_path):
        (tmp_path / "train").mkdir()
        (tmp_path / "bank_2").mkdir()
        (tmp_path / "bank_5").mkdir()
        (tmp_path / "bank_7.part").mkdir()
        (tmp_path / "bank_7.part" / "half.png").write_bytes(b"x")
        pool = make_pool(tmp_path, initial=[tmp_path / "train"])
        assert pool.dirs == [
            tmp_path / "train", tmp_path / "bank_2", tmp_path / "bank_5"
        ]
        assert not (tmp_path / "bank_7.part").exists()
        assert pool.seed == 6  # resumes after the highest adopted bank

    def test_empty_pool_starts_at_seed_2(self, tmp_path):
        pool = make_pool(tmp_path)
        assert pool.seed == 2  # 0 = initial train bank, 1 = valid set


class TestSeedReservation:
    def test_resumed_pool_skips_heldout_seed_99(self, tmp_path):
        """A pool adopted at bank_98 initializes seed=99 — launching must
        skip it or training would see the held-out evaluation scenes."""
        (tmp_path / "bank_98").mkdir()
        pool = make_pool(tmp_path, initial=[])
        assert pool.seed == 99
        fake_render(pool, OK_SCRIPT)
        pool.launch()
        pool.proc.wait()
        assert pool.render_dir.name == "bank_100.part"
        assert not list(tmp_path.glob("bank_99*"))
        pool.shutdown()


class TestRotation:
    def test_rotate_harvests_and_round_robins(self, tmp_path):
        (tmp_path / "train").mkdir()
        pool = make_pool(tmp_path, initial=[tmp_path / "train"])
        fake_render(pool, OK_SCRIPT)
        pool.launch()
        pool.proc.wait()
        first = pool.rotate()  # harvests bank_2, advances to it
        assert first == tmp_path / "bank_2"
        assert (tmp_path / "bank_2" / "scene.png").exists()
        # next render (seed 3) was started by the harvest
        pool.proc.wait()
        assert pool.rotate() == tmp_path / "bank_3"
        assert pool.rotate() == tmp_path / "train"  # wraps around
        pool.shutdown()

    def test_eviction_respects_cap(self, tmp_path):
        (tmp_path / "train").mkdir()
        pool = make_pool(tmp_path, initial=[tmp_path / "train"], cap=2)
        fake_render(pool, OK_SCRIPT)
        pool.launch()
        for _ in range(3):
            pool.proc.wait()
            pool.rotate()
        assert len(pool.dirs) <= 2
        assert not (tmp_path / "train").exists()  # oldest evicted
        pool.shutdown()


class TestFailureHandling:
    def test_renderer_failure_retries_then_raises(self, tmp_path):
        (tmp_path / "train").mkdir()
        pool = make_pool(tmp_path, initial=[tmp_path / "train"],
                         max_consecutive_failures=2)
        fake_render(pool, FAIL_SCRIPT)
        pool.launch()
        for _ in range(2):  # two failed harvests tolerated, each relaunches
            pool.proc.wait()
            assert pool.rotate() == tmp_path / "train"
        pool.proc.wait()
        with pytest.raises(RuntimeError, match="failed 3 times"):
            pool.rotate()
        pool.shutdown()

    def test_shutdown_reaps_inflight_render(self, tmp_path):
        (tmp_path / "train").mkdir()
        pool = make_pool(tmp_path, initial=[tmp_path / "train"])
        fake_render(pool, "import time; time.sleep(60)")
        pool.launch()
        pool.shutdown()
        assert pool.proc.poll() is not None  # reaped, not orphaned
