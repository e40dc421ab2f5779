"""sample_frames contract: 1 row -> ceil(n_frames/every_n) rows, empty
payload -> no rows, indices stride by every_n, hashes reproduce the
stub fold."""

from extraction.multimodal import _fold, sample_frames


def test_sample_frames_expansion(spark):
    rows = [
        ("m1", "image/jpeg", b"hello world"),
        ("m2", "audio/wav", b""),           # empty -> no frames
        ("m3", "video/mp4", b"abc" * 100),
    ]
    media = spark.createDataFrame(
        rows, "media_ref string, mime string, payload binary"
    )
    got = sample_frames(media, every_n=4).collect()
    by_ref = {}
    for r in got:
        by_ref.setdefault(r["media_ref"], []).append(r)
    assert "m2" not in by_ref
    for ref, payload in (("m1", b"hello world"), ("m3", b"abc" * 100)):
        h = _fold(payload)
        n_frames = 8 + h % 24
        want_idx = list(range(0, n_frames, 4))
        rs = sorted(by_ref[ref], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rs] == want_idx
        assert all(r["n_frames"] == n_frames for r in rs)
        assert [r["frame_hash"] for r in rs] == [
            ((h ^ i) * 1099511628211) % (1 << 64) % (1 << 62) for i in want_idx
        ]
