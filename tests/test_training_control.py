"""TrainingController file-sentinel semantics + TrainingState persistence
(TrainingControlTests.swift parity) and dataset bucketing."""

import json
import os

import numpy as np
import pytest

from flux2_tpu.training import data as td
from flux2_tpu.training.control import TrainingController, TrainingState, config_hash


def test_sentinel_stop(tmp_path):
    c = TrainingController(str(tmp_path))
    assert not c.should_stop()
    TrainingController.write_sentinel(str(tmp_path), "stop")
    assert c.should_stop()
    TrainingController.clear_sentinel(str(tmp_path), "stop")
    assert not c.should_stop()


def test_sentinel_pause_resume(tmp_path):
    c = TrainingController(str(tmp_path))
    TrainingController.write_sentinel(str(tmp_path), "pause")
    assert c.should_pause()
    c.request_resume()  # clears the sentinel too
    assert not c.should_pause()
    assert not os.path.exists(os.path.join(str(tmp_path), ".pause"))


def test_checkpoint_request_consumed_once(tmp_path):
    c = TrainingController(str(tmp_path))
    TrainingController.write_sentinel(str(tmp_path), "checkpoint")
    assert c.consume_checkpoint_request()
    assert not c.consume_checkpoint_request()  # cleared


def test_observers(tmp_path):
    c = TrainingController(str(tmp_path))
    events = []
    c.add_observer(events.append)
    c.request_pause()
    c.request_stop()
    assert events == ["pause", "stop"]


def test_training_state_roundtrip(tmp_path):
    s = TrainingState(rng_seed=42, config_hash="abc")
    s.step = 10
    s.record_loss(0.5)
    s.record_loss(0.3)
    s.record_validation(10, scene=8.0, style=7.0, prompt="p")
    path = str(tmp_path / "training_state.json")
    s.save(path)
    r = TrainingState.load(path)
    assert r.step == 10
    assert r.best_loss == 0.3
    assert r.rng_seed == 42
    assert r.best_validation_step() == 10
    s.elapsed_s = 100.0
    assert s.eta_seconds(20) == pytest.approx(100.0)


def test_config_hash_stability():
    import dataclasses

    @dataclasses.dataclass
    class C:
        a: int = 1
        b: str = "x"

    assert config_hash(C()) == config_hash(C())
    assert config_hash(C()) != config_hash(C(a=2))


def test_caption_parsing():
    assert td.parse_caption("a photo of [trigger] smiling", "sks person") == "a photo of sks person smiling"
    assert td.parse_caption("a photo of [trigger] smiling", None) == "a photo of smiling"


def test_bucket_assignment():
    assert td.assign_bucket(1000, 1000) == (1024, 1024)
    assert td.assign_bucket(1920, 1080) in ((1344, 768), (1536, 640))
    assert td.assign_bucket(600, 1500) == (640, 1536)


def test_bucket_assignment_multi_resolution():
    """bucket_resolutions lists the SAME ratio set at several scales; ratio
    ties must break by area so each image lands at its own resolution tier
    (and small images never upscale past 2x into a larger tier)."""
    buckets = list(td.scaled_buckets(512))
    for b in td.scaled_buckets(1024):
        if b not in buckets:
            buckets.append(b)
    assert td.assign_bucket(512, 512, buckets) == (512, 512)
    assert td.assign_bucket(1024, 1024, buckets) == (1024, 1024)
    assert td.assign_bucket(300, 300, buckets) == (512, 512)
    # non-square too: a ~1MP 16:9 image picks the 1024-tier wide bucket
    w1024 = td.assign_bucket(1344, 768, buckets)
    assert w1024[0] * w1024[1] > 512 * 512


def test_dataset_scan_and_batches(tmp_path):
    from PIL import Image

    for i, size in enumerate([(64, 64), (64, 64), (128, 64)]):
        Image.new("RGB", size).save(tmp_path / f"img{i}.png")
        with open(tmp_path / f"img{i}.txt", "w") as f:
            f.write(f"[trigger] item {i}")
    items = td.load_dataset(str(tmp_path), trigger="sks")
    assert len(items) == 3
    assert items[0].caption == "sks item 0"
    grouped = td.group_by_bucket(items)
    assert len(grouped) == 2  # square + 2:1
    bs = list(td.batches(items, batch_size=2, seed=0))
    for batch in bs:
        assert len({it.bucket for it in batch}) == 1  # bucket-homogeneous


def test_latent_cache_invalidation(tmp_path):
    from PIL import Image

    img = tmp_path / "a.png"
    Image.new("RGB", (64, 64)).save(img)
    item = td.DatasetItem(str(img), "c", (64, 64))
    calls = []

    def encode(arr):
        calls.append(1)
        return np.zeros((4, 4), np.float32)

    c1 = td.LatentCache(str(tmp_path / "cache"), encoder_version="v1")
    c1.get_or_encode(item, encode)
    c1.get_or_encode(item, encode)
    assert len(calls) == 1  # second call hit the cache
    c2 = td.LatentCache(str(tmp_path / "cache"), encoder_version="v2")
    c2.get_or_encode(item, encode)
    assert len(calls) == 2  # version bump invalidates
