"""Multimodal plumbing tests: schema, batch shapes, stub contracts."""

from __future__ import annotations

import pytest

from sql_database_engine_spark.operators import multimodal as mm
from .conftest import SF_SMOKE


def test_decode_stub_contract():
    out = mm.decode_and_featurize(b"abc", "image")
    assert out["feat_dim"] == 8 and out["feat_mean"] > 0
    with pytest.raises(NotImplementedError):
        mm.decode_and_featurize(b"abc", "hologram")


def test_byte_features_pipeline_schema_and_rows(spark):
    df = mm.multimodal_byte_features(spark, SF_SMOKE)
    assert df.columns == ["doc_id", "media_type", "n_bytes",
                          "content_hash", "feat_mean", "feat_dim"]
    rows = df.collect()
    assert len(rows) == 500
    assert all(len(r.content_hash) == 64 and r.n_bytes > 0 for r in rows)


def test_wav_decode_roundtrip_local():
    """The decode kernel must recover exactly what the generator
    wrote — pure local check, no Spark."""
    import pandas as pd

    blob = mm.wav_pcm_bytes(7)
    out = next(mm.decode_wav_batches(
        iter([pd.DataFrame({"doc_id": [7], "payload": [blob]})])))
    r = out.iloc[0]
    n = 100 + 7 % 50
    samples = [(7 * 31 + i * 17) % 4096 - 2048 for i in range(n)]
    assert r.n_samples == n
    assert r.sample_rate == 8000 + (7 % 3) * 4000
    assert r.sum_samples == sum(samples)
    assert r.min_sample == min(samples)
    assert r.max_sample == max(samples)
    assert r.sum_sq == sum(v * v for v in samples)


def test_wav_decode_rejects_corrupt_header():
    import pandas as pd

    blob = b"JUNK" + mm.wav_pcm_bytes(1)[4:]
    with pytest.raises(ValueError):
        next(mm.decode_wav_batches(
            iter([pd.DataFrame({"doc_id": [1], "payload": [blob]})])))


def test_frame_stub_sample_fanout(spark):
    media = mm.typed_media_table(spark, SF_SMOKE)
    n_videos = media.filter("media_type = 'video'").count()
    frames = mm.multimodal_frame_stub_sample(spark, SF_SMOKE)
    got = frames.collect()
    # every video emits >= 1 frame; every 5th frame kept
    assert len({r.doc_id for r in got}) == n_videos
    assert len(got) >= n_videos
    assert all(r.frame_idx % 5 == 0 for r in got)


def test_rvid_decode_roundtrip_local():
    """The raw-video kernel must recover exactly what the generator
    wrote — pure local check, no Spark."""
    import pandas as pd

    blob = mm.rvid_bytes(11)
    out = next(mm.decode_rvid_batches(
        iter([pd.DataFrame({"doc_id": [11], "payload": [blob]})])))
    n_frames = 10 + 11 % 20
    kept = list(range(0, n_frames, 5))
    assert list(out.frame_idx) == kept
    for row, f in zip(out.itertuples(), kept):
        px = [(11 * 7 + f * 13 + j * 5) % 256
              for j in range(mm._RV_FRAME_BYTES)]
        assert row.px_sum == sum(px)
        assert row.px_min == min(px)
        assert row.px_max == max(px)


def test_rvid_decode_rejects_truncated():
    import pandas as pd

    blob = mm.rvid_bytes(3)[:-5]
    with pytest.raises(ValueError):
        next(mm.decode_rvid_batches(
            iter([pd.DataFrame({"doc_id": [3], "payload": [blob]})])))


def test_parse_wav16_roundtrip_property():
    """Generator -> shared parser round-trip for arbitrary doc ids:
    _parse_wav16 (used by both WAV kernels) must recover the exact
    rate and sample sequence wav_pcm_bytes encoded. Pure local
    property, no Spark."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=0, max_value=10**9))
    def check(doc_id):
        rate, frames = mm._parse_wav16(doc_id, mm.wav_pcm_bytes(doc_id))
        n = 100 + doc_id % 50
        assert rate == 8000 + (doc_id % 3) * 4000
        assert len(frames) == n
        assert all(int(frames[i]) == (doc_id * 31 + i * 17) % 4096 - 2048
                   for i in range(n))

    check()


def test_parse_wav16_rejects_corrupt_headers():
    """Each container gate actually fires: magic, fmt tag, PCM tag,
    channel/bit-depth, data tag."""
    blob = bytearray(mm.wav_pcm_bytes(7))
    good = bytes(blob)
    mm._parse_wav16(7, good)  # sanity

    bad_magic = b"JUNK" + good[4:]
    with pytest.raises(ValueError):
        mm._parse_wav16(7, bad_magic)

    bad_fmt = good[:12] + b"xxx " + good[16:]
    with pytest.raises(ValueError):
        mm._parse_wav16(7, bad_fmt)

    stereo = bytearray(good)
    stereo[22:24] = (2).to_bytes(2, "little")  # n_channels = 2
    with pytest.raises(NotImplementedError):
        mm._parse_wav16(7, bytes(stereo))

    bad_data = good[:36] + b"DATA" + good[40:]
    with pytest.raises(ValueError):
        mm._parse_wav16(7, bad_data)


def test_parse_wav16_rejects_nonpcm_and_wrong_depth():
    """The remaining two container gates: a non-PCM format tag and a
    non-16 bit depth must be rejected (the quartet above covers magic,
    fmt tag, channels, data tag)."""
    good = mm.wav_pcm_bytes(7)

    nonpcm = bytearray(good)
    nonpcm[20:22] = (3).to_bytes(2, "little")  # IEEE-float format tag
    with pytest.raises(ValueError):
        mm._parse_wav16(7, bytes(nonpcm))

    eight_bit = bytearray(good)
    eight_bit[34:36] = (8).to_bytes(2, "little")  # bits per sample
    with pytest.raises(NotImplementedError):
        mm._parse_wav16(7, bytes(eight_bit))


def test_ppm_decode_roundtrip_local():
    """The P6 kernel must recover exactly what the generator wrote —
    pure local check, no Spark."""
    import pandas as pd

    blob = mm.ppm_bytes(23)
    out = next(mm.decode_ppm_batches(
        iter([pd.DataFrame({"doc_id": [23], "payload": [blob]})])))
    w, h = 8 + 23 % 9, 6 + 23 % 7
    px = [(23 * 11 + j * 3) % 256 for j in range(w * h * 3)]
    assert out.width[0] == w and out.height[0] == h
    assert out.r_sum[0] == sum(px[0::3])
    assert out.g_sum[0] == sum(px[1::3])
    assert out.b_sum[0] == sum(px[2::3])
    assert out.px_min[0] == min(px) and out.px_max[0] == max(px)


def test_ppm_decode_rejects_truncated_header():
    """A header cut off mid-field must raise, not spin the tokenizer
    forever (the unbounded-while trap a review pass caught)."""
    import pandas as pd

    for bad in (b"P6\n8", b"P6", b"P6\n8 6\n", b"P6\n  "):
        with pytest.raises(ValueError):
            next(mm.decode_ppm_batches(
                iter([pd.DataFrame({"doc_id": [1], "payload": [bad]})])))


def test_ppm_decode_rejects_bad_raster_and_maxval():
    import pandas as pd

    good = mm.ppm_bytes(5)
    with pytest.raises(ValueError):  # truncated raster
        next(mm.decode_ppm_batches(
            iter([pd.DataFrame({"doc_id": [5], "payload": [good[:-4]]})])))
    bad_maxval = good.replace(b"255", b"127", 1)
    with pytest.raises(ValueError):
        next(mm.decode_ppm_batches(
            iter([pd.DataFrame({"doc_id": [5], "payload": [bad_maxval]})])))


def test_scene_cut_detects_exact_boundaries_local():
    """The scene-cut kernel must find EXACTLY the generator's scene
    boundaries (multiples of _RV_SCENE_LEN) — pure local check: cut
    count, first cut position, and total L1 recomputed from the
    per-pixel formula."""
    import pandas as pd

    doc_id = 17
    blob = mm.rvid_scene_bytes(doc_id)
    out = next(mm.detect_scene_cuts_batches(
        iter([pd.DataFrame({"doc_id": [doc_id], "payload": [blob]})])))
    n_frames = 12 + doc_id % 12
    row = out.iloc[0]
    assert row.n_frames == n_frames

    def px(f, j):
        return (doc_id * 7 + (f // mm._RV_SCENE_LEN) * 31 + j * 5) % 256

    l1 = [sum(abs(px(f + 1, j) - px(f, j))
              for j in range(mm._RV_FRAME_BYTES))
          for f in range(n_frames - 1)]
    cuts = [f for f, v in enumerate(l1) if v > mm._RV_CUT_THRESHOLD]
    # Boundaries are exactly the frame pairs straddling a scene edge.
    assert cuts == [f for f in range(n_frames - 1)
                    if (f + 1) % mm._RV_SCENE_LEN == 0]
    assert row.n_cuts == len(cuts)
    assert row.first_cut_frame == (cuts[0] + 1 if cuts else -1)
    assert row.total_cut_l1 == sum(l1[f] for f in cuts)
    # Within-scene deltas are exactly zero — the separation margin
    # the threshold relies on.
    assert all(v == 0 for f, v in enumerate(l1) if f not in cuts)


def test_scene_cut_rejects_truncated_and_wrong_magic():
    import pandas as pd

    good = mm.rvid_scene_bytes(5)
    for bad in (good[:-3], b"XVID" + good[4:]):
        with pytest.raises(ValueError):
            next(mm.detect_scene_cuts_batches(
                iter([pd.DataFrame({"doc_id": [5], "payload": [bad]})])))


def test_vad_windows_match_generator_local():
    """VAD decisions must be exactly the generator's speech windows
    (odd window indices) with energies recomputed per sample."""
    import pandas as pd

    doc_id = 23
    blob = mm.wav_speech_bytes(doc_id)
    out = next(mm.vad_batches(
        iter([pd.DataFrame({"doc_id": [doc_id], "payload": [blob]})])))
    n = 100 + doc_id % 50
    n_full = n // mm._VAD_WIN
    row = out.iloc[0]
    assert row.n_windows == n_full

    def s(i):
        amp = (mm._VAD_LOUD_AMP if (i // mm._VAD_WIN) % 2 == 1
               else mm._VAD_QUIET_AMP)
        return (doc_id * 31 + i * 17) % (2 * amp + 1) - amp

    energies = [sum(s(w * mm._VAD_WIN + j) ** 2
                    for j in range(mm._VAD_WIN)) for w in range(n_full)]
    speech = [w for w, e in enumerate(energies)
              if e > mm._VAD_THRESHOLD]
    assert speech == [w for w in range(n_full) if w % 2 == 1]
    assert row.n_speech == len(speech)
    assert row.first_speech_window == (speech[0] if speech else -1)
    assert row.speech_energy == sum(energies[w] for w in speech)


def test_vad_property_arbitrary_doc_ids():
    """For ANY doc id the kernel's decisions equal the per-sample
    brute force — the hypothesis twin of the fixed-id boundary test."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(min_value=0, max_value=10**9))
    def check(doc_id):
        blob = mm.wav_speech_bytes(doc_id)
        out = next(mm.vad_batches(
            iter([pd.DataFrame({"doc_id": [doc_id],
                                "payload": [blob]})])))
        row = out.iloc[0]
        n = 100 + doc_id % 50
        n_full = n // mm._VAD_WIN

        def s(i):
            amp = (mm._VAD_LOUD_AMP if (i // mm._VAD_WIN) % 2 == 1
                   else mm._VAD_QUIET_AMP)
            return (doc_id * 31 + i * 17) % (2 * amp + 1) - amp

        energies = [sum(s(w * mm._VAD_WIN + j) ** 2
                        for j in range(mm._VAD_WIN))
                    for w in range(n_full)]
        speech = [w for w, e in enumerate(energies)
                  if e > mm._VAD_THRESHOLD]
        assert row.n_windows == n_full
        assert row.n_speech == len(speech)
        assert row.first_speech_window == (speech[0] if speech else -1)
        assert row.speech_energy == sum(energies[w] for w in speech)

    check()


def test_scene_cut_property_arbitrary_doc_ids():
    """Scene-cut decisions equal the per-pixel brute force for ANY
    doc id (cut positions, count, first, total magnitude)."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(st.integers(min_value=0, max_value=10**9))
    def check(doc_id):
        blob = mm.rvid_scene_bytes(doc_id)
        out = next(mm.detect_scene_cuts_batches(
            iter([pd.DataFrame({"doc_id": [doc_id],
                                "payload": [blob]})])))
        row = out.iloc[0]
        n_frames = 12 + doc_id % 12

        def px(f, j):
            return (doc_id * 7 + (f // mm._RV_SCENE_LEN) * 31
                    + j * 5) % 256

        l1 = [sum(abs(px(f + 1, j) - px(f, j))
                  for j in range(mm._RV_FRAME_BYTES))
              for f in range(n_frames - 1)]
        cuts = [f for f, v in enumerate(l1)
                if v > mm._RV_CUT_THRESHOLD]
        assert row.n_frames == n_frames
        assert row.n_cuts == len(cuts)
        assert row.first_cut_frame == (cuts[0] + 1 if cuts else -1)
        assert row.total_cut_l1 == sum(l1[f] for f in cuts)

    check()
