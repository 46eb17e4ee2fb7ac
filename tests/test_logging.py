"""MetricLogger tests incl. the W&B surface (mocked; zero-egress env).

Covers the reference logger features: metric multiplexing, artifact
upload/prune (wandb_logger.py:238-376), artifact-based checkpoint resume
(:77-87), and image/video media logging (:156-198).
"""

import json
import sys
import types

import numpy as np
import pytest

from sast_tpu.utils.logging import MetricLogger, SmoothedValue


class _FakeArtifact:
    def __init__(self, name=None, type=None):
        self.name = name
        self.type = type
        self.dirs = []

    def add_dir(self, d):
        self.dirs.append(d)

    def download(self):
        return "/tmp/fake_artifact_dir"


class _FakeRun:
    def __init__(self):
        self.logged = []
        self.artifacts = []
        self.id = "fakerun"
        self.entity = "ent"
        self.project = "proj"
        self.finished = False

    def log(self, metrics, step=None):
        self.logged.append((step, metrics))

    def log_artifact(self, artifact, aliases=None):
        self.artifacts.append((artifact, aliases))

    def use_artifact(self, name):
        return _FakeArtifact(name)

    def finish(self):
        self.finished = True


@pytest.fixture
def fake_wandb(monkeypatch):
    run = _FakeRun()

    def _init(**kw):
        run.init_kwargs = kw
        return run

    mod = types.ModuleType("wandb")
    mod.init = _init
    mod.Artifact = _FakeArtifact
    mod.Image = lambda im, caption=None: ("image", np.asarray(im).shape, caption)
    mod.Video = lambda v, fps=4: ("video", fps)

    class _Api:
        def artifact_versions(self, type_, path):
            return []

    mod.Api = _Api
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return run


def test_jsonl_logging(tmp_path):
    lg = MetricLogger(str(tmp_path))
    lg.log({"train/loss": 1.5}, step=10)
    lg.log({"train/loss": 1.0}, step=20)
    lg.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[0]["step"] == 10 and rows[0]["train/loss"] == 1.5
    assert rows[1]["step"] == 20


def test_wandb_metrics_and_media(tmp_path, fake_wandb):
    lg = MetricLogger(str(tmp_path), use_wandb=True)
    lg.log({"val/AP": 0.5}, step=100)
    assert fake_wandb.logged[-1] == (100, {"val/AP": 0.5})

    panel = np.zeros((8, 8, 3), np.uint8)
    lg.log_images("val/predictions", [panel, panel], step=100, captions=["a", "b"])
    step, metrics = fake_wandb.logged[-1]
    assert step == 100
    imgs = metrics["val/predictions"]
    assert len(imgs) == 2 and imgs[0] == ("image", (8, 8, 3), "a")

    lg.log_video("val/clip", np.zeros((2, 3, 8, 8), np.uint8), step=100, fps=8)
    assert fake_wandb.logged[-1][1]["val/clip"] == ("video", 8)
    lg.close()
    assert fake_wandb.finished


def test_wandb_artifact_upload_and_download(tmp_path, fake_wandb):
    lg = MetricLogger(str(tmp_path), use_wandb=True)
    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    lg.log_checkpoint(str(ckpt_dir), step=500, aliases=["best"])
    artifact, aliases = fake_wandb.artifacts[-1]
    assert str(ckpt_dir) in artifact.dirs
    assert "best" in aliases and "step-500" in aliases and "last" in aliases

    local = lg.download_checkpoint("ent/proj/checkpoint-fakerun:best")
    assert local == "/tmp/fake_artifact_dir"


def test_wandb_artifact_prune_keeps_aliased(tmp_path, fake_wandb, monkeypatch):
    """Prune path (reference wandb_logger.py:326-376 _rm_but_top_k): versions
    holding 'best'/'last' aliases survive; non-aliased versions beyond
    keep_top_k are deleted."""
    import sys

    class _FakeVersion:
        def __init__(self, aliases):
            self.aliases = aliases
            self.deleted = False

        def delete(self):
            self.deleted = True

    versions = [
        _FakeVersion(["last", "step-500"]),
        _FakeVersion(["best", "step-400"]),
        _FakeVersion(["step-300"]),
        _FakeVersion(["step-200"]),
    ]

    class _Api:
        def artifact_versions(self, type_, path):
            assert type_ == "model"
            return versions

    monkeypatch.setattr(sys.modules["wandb"], "Api", _Api)

    lg = MetricLogger(str(tmp_path), use_wandb=True)
    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    lg.log_checkpoint(str(ckpt_dir), step=500, keep_top_k=1)
    assert not versions[0].deleted  # 'last'
    assert not versions[1].deleted  # 'best'
    assert not versions[2].deleted  # first non-aliased within top-k
    assert versions[3].deleted  # beyond keep_top_k


def test_media_noop_offline(tmp_path):
    lg = MetricLogger(str(tmp_path), use_wandb=False)
    # must not raise without a W&B run
    lg.log_images("k", [np.zeros((4, 4, 3), np.uint8)])
    lg.log_video("k", np.zeros((1, 3, 4, 4), np.uint8))
    assert lg.download_checkpoint("x/y/z:latest") is None


def test_smoothed_value():
    s = SmoothedValue()
    assert s.update(2.0) == 2.0
    assert s.update(4.0) == 3.0


def test_wandb_run_id_resume(tmp_path, fake_wandb):
    """run_id plumbs into wandb.init(id=..., resume='allow') — the
    reference's wandb_runpath resume workflow (loggers/utils.py:14-19)."""
    from sast_tpu.utils.logging import MetricLogger

    MetricLogger(str(tmp_path), use_wandb=True, run_id="abc123")
    assert fake_wandb.init_kwargs["id"] == "abc123"
    assert fake_wandb.init_kwargs["resume"] == "allow"

    MetricLogger(str(tmp_path), use_wandb=True)
    assert fake_wandb.init_kwargs["id"] is None
    assert fake_wandb.init_kwargs["resume"] is None
