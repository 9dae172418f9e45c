from __future__ import annotations

from linkgraph.sources.multimodal import (
    extract_features,
    generate_media,
    resize_thumbnail,
    sample_frames,
)


def test_media_generation_and_schema(spark):
    m = generate_media(spark, 30)
    assert m.count() == 30
    kinds = {r.kind for r in m.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    img = m.filter("kind = 'image'").first()
    assert img.width == 64 and img.mime == "image/png"
    assert isinstance(bytes(img.payload), bytes) and len(bytes(img.payload)) == 256


def test_feature_extraction_deterministic(spark):
    m = generate_media(spark, 20)
    f1 = {r.media_id: r.feature for r in extract_features(m, out_dim=8).collect()}
    f2 = {r.media_id: r.feature for r in extract_features(m, out_dim=8).collect()}
    assert f1 == f2
    assert all(len(v) == 8 for v in f1.values())
    assert all(0.0 <= x <= 1.0 for v in f1.values() for x in v)
    # distinct payloads -> distinct features
    assert f1[0] != f1[3]


def test_thumbnail_plumbing(spark):
    m = generate_media(spark, 12)
    t = resize_thumbnail(m, max_px=16).collect()
    assert len(t) == 4  # every 3rd row is an image
    assert all(r.thumb_w <= 16 and r.thumb_h <= 16 for r in t)


def test_frame_sampling(spark):
    m = generate_media(spark, 12)
    fr = sample_frames(m, every_n=30, max_frames=3).collect()
    vids = {r.media_id for r in fr}
    assert all(mid % 3 == 2 for mid in vids)  # only video rows
    by_vid = {}
    for r in fr:
        by_vid.setdefault(r.media_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 30, 60] for v in by_vid.values())
