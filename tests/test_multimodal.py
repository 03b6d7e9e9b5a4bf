"""Multimodal plumbing: the REAL PPM (P6) codec path — encode/decode
roundtrip, malformed-payload behavior, and the Spark stats pipeline vs a
direct numpy computation."""

from __future__ import annotations

import numpy as np
import pytest

from hash_db_spark.operators import multimodal as M


def test_ppm_roundtrip_every_pixel():
    for mid, w, h in [(0, 4, 3), (7, 8, 5), (123, 5, 4)]:
        payload = M.ppm_encode(mid, w, h)
        gw, gh, px = M.ppm_decode(payload)
        assert (gw, gh) == (w, h) and px.shape == (h, w, 3)
        for r in range(h):
            for c in range(w):
                for ch in range(3):
                    assert px[r, c, ch] == (mid * 31 + r * 7 + c * 13 + ch * 97) % 256


def test_ppm_decode_rejects_malformed():
    with pytest.raises(ValueError, match="not a P6"):
        M.ppm_decode(b"P5\n2 2\n255\nxxxx")
    with pytest.raises(ValueError, match="truncated"):
        M.ppm_decode(b"P6\n2 2")
    with pytest.raises(ValueError, match="maxval"):
        M.ppm_decode(b"P6\n2 2\n65535\n" + b"\0" * 12)
    # payload shorter than width*height*3
    with pytest.raises(ValueError):
        M.ppm_decode(b"P6\n4 4\n255\n" + b"\0" * 5)


def test_ppm_stats_pipeline_matches_numpy(spark):
    ids = spark.createDataFrame([(i,) for i in range(20)], ["doc_id"])
    media = M.synth_ppm_media(ids, "doc_id")
    got = {
        r.media_id: (r.width, r.height, r.sum_r, r.sum_g, r.sum_b)
        for r in M.ppm_stats(media).collect()
    }
    assert len(got) == 20
    for i in range(20):
        w, h = 4 + i % 5, 3 + i % 3
        _, _, px = M.ppm_decode(M.ppm_encode(i, w, h))
        sums = px.astype(np.int64).sum(axis=(0, 1))
        assert got[i] == (w, h, int(sums[0]), int(sums[1]), int(sums[2]))


def test_wav_roundtrip_and_malformed():
    rate, s = M.wav_decode(M.wav_encode(3, 75, sample_rate=16000))
    assert rate == 16000 and len(s) == 75
    for t in (0, 37, 74):
        assert s[t] == (3 * 131 + t * 17) % 2048 - 1024
    with pytest.raises(ValueError, match="RIFF"):
        M.wav_decode(b"OggS" + b"\0" * 60)
    # stereo (channels=2) rejected
    import struct
    bad = bytearray(M.wav_encode(1, 10))
    bad[22:24] = struct.pack("<H", 2)
    with pytest.raises(ValueError, match="unsupported WAV"):
        M.wav_decode(bytes(bad))


def test_wav_stats_pipeline_matches_numpy(spark):
    ids = spark.createDataFrame([(i,) for i in range(15)], ["doc_id"])
    got = {
        r.media_id: (r.sample_rate, r.n_samples, r.sum_abs, r.peak)
        for r in M.wav_stats(M.synth_wav_media(ids, "doc_id")).collect()
    }
    for i in range(15):
        _, s = M.wav_decode(M.wav_encode(i, 50 + i % 50))
        a = np.abs(s.astype(np.int64))
        assert got[i] == (8000, len(s), int(a.sum()), int(a.max()))


def test_wav_window_energy_matches_numpy(spark):
    """Windowed energy contour: every window's sum-of-squares equals the
    numpy reference, the last (ragged) window carries its short length,
    and window indices tile ceil(n/25)."""
    ids = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    rows = M.wav_window_energy(M.synth_wav_media(ids, "doc_id")).collect()
    got = {(r.media_id, r.win): (r.n, r.sum_sq) for r in rows}
    for i in range(8):
        _, s = M.wav_decode(M.wav_encode(i, 50 + i % 50))
        sq = s.astype(np.int64) ** 2
        n_wins = (len(sq) + 24) // 25
        for w in range(n_wins):
            chunk = sq[w * 25 : (w + 1) * 25]
            assert got[(i, w)] == (len(chunk), int(chunk.sum()))
        assert (i, n_wins) not in got


def test_y4m_roundtrip_and_malformed():
    w, h, frames = M.y4m_decode(M.y4m_encode(9, 8, 6, 4))
    assert (w, h, len(frames)) == (8, 6, 4)
    for f, r, c in [(0, 0, 0), (3, 5, 7), (2, 4, 1)]:
        assert frames[f][r, c] == (9 * 37 + f * 11 + r * 5 + c * 3) % 256
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        M.y4m_decode(b"RIFF....WAVE\n")
    with pytest.raises(ValueError, match="chroma"):
        M.y4m_decode(b"YUV4MPEG2 W4 H4 C444\nFRAME\n" + b"\0" * 48)
    # truncated frame
    good = M.y4m_encode(1, 4, 4, 2)
    with pytest.raises(ValueError, match="truncated"):
        M.y4m_decode(good[:-5])


def test_y4m_stats_pipeline_matches_numpy(spark):
    ids = spark.createDataFrame([(i,) for i in range(12)], ["doc_id"])
    got = {
        r.media_id: (r.width, r.height, r.n_frames, r.sum_luma)
        for r in M.y4m_stats(M.synth_y4m_media(ids, "doc_id")).collect()
    }
    for i in range(12):
        w, h, nf = 4 + 2 * (i % 3), 4 + 2 * (i % 2), 2 + i % 3
        gw, gh, frames = M.y4m_decode(M.y4m_encode(i, w, h, nf))
        sl = int(sum(f.astype(np.int64).sum() for f in frames))
        assert got[i] == (w, h, nf, sl)


def test_dhash_brightness_invariant():
    """dHash must be invariant under a constant brightness offset (the
    property that makes it a PERCEPTUAL hash, not a checksum) and must
    differ for a structurally different image."""
    import numpy as np

    from hash_db_spark.operators import multimodal as M

    rng = np.arange(6 * 11).reshape(6, 11) * 7 % 200
    base = M.dhash_from_gray(rng)
    assert M.dhash_from_gray(rng + 40) == base
    flipped = M.dhash_from_gray(rng[:, ::-1].copy())
    assert flipped != base
    assert 0 <= base < 1 << 60


def test_image_dhash_exact_dup_pairs(spark):
    """Identical rasters -> hamming 0; the banded pair join finds them."""
    from hash_db_spark.operators import dedup as D
    from hash_db_spark.operators import multimodal as M

    # ids 7 and 22 share dims (both % 5 == 2, % 3 == 1) and id 22 = 7 + 15
    # shifts every channel by 15*31 mod 256 — same dims, different pixels.
    docs = spark.createDataFrame([(7,), (22,), (9,)], ["doc_id"])
    hashed = M.image_dhash(M.synth_ppm_media(docs, "doc_id"))
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in D.hamming_band_pairs(hashed, "dhash", max_hamming=60).collect()
    }
    # brute-force ground truth from the collected hashes
    hs = {r.id: r.dhash for r in hashed.collect()}
    for (a, b), ham in pairs.items():
        assert bin(hs[a] ^ hs[b]).count("1") == ham


def test_video_dup_pairs_containment(spark):
    """Containment semantics on a controlled frame relation: clip 2's
    evidence set is a subset of clip 1's -> pair; clip 3 shares nothing.
    A boilerplate hash present in every clip is excluded from evidence."""
    from hash_db_spark.operators import multimodal as M

    BOILER = 999
    frames = spark.createDataFrame(
        [
            (1, 0, 10), (1, 1, 11), (1, 2, 12), (1, 3, BOILER),
            (2, 0, 10), (2, 1, 11), (2, 2, BOILER),
            (3, 0, 50), (3, 1, BOILER),
        ],
        ["media_id", "frame", "dhash"],
    )
    got = {
        (r.media_a, r.media_b): r.n_shared
        for r in M.video_dup_pairs(frames, max_hash_media=2).collect()
    }
    assert got == {(1, 2): 2}


def test_image_in_video_near_match_and_hot_cap(spark):
    """Cross-modal containment on a controlled relation: image A matches
    clip 1 exactly in two frames, image B matches clip 2 within
    hamming 2 (one frame), image C is 10+ bits from everything, and a
    boilerplate hash shared by >cap media matches nothing."""
    from hash_db_spark.operators import multimodal as M

    BOILER = (1 << 45) | 7
    images = spark.createDataFrame(
        [
            (100, 0b1111),            # A: exact match for clip 1 frames
            (101, 0b1111 | (1 << 20)),  # B: hamming 1 from clip 2's 0b1111|1<<21? no — see frames
            (102, (1 << 59) | (1 << 30) | (1 << 10)),  # C: far from all
            (103, BOILER),            # D: boilerplate hash
        ],
        ["id", "dhash"],
    )
    frames = spark.createDataFrame(
        [
            (1, 0, 0b1111), (1, 1, 0b1111), (1, 2, 0b110011),
            (2, 0, 0b1111 | (1 << 20) | (1 << 21)),  # hamming 1 from B
            (2, 1, (1 << 58)),
            (3, 0, BOILER), (4, 0, BOILER), (5, 0, BOILER),
        ],
        ["media_id", "frame", "dhash"],
    )
    got = {
        (r.image_id, r.media_id): r.n_frames
        for r in M.image_in_video(
            images, frames, max_hamming=3, max_hash_media=3
        ).collect()
    }
    # A matches clip 1 frames 0,1 exactly (frame 2 is hamming 4:
    # 0b1111 ^ 0b110011 = 0b111100 -> excluded) and clip 2 frame 0 at
    # hamming 2; B matches clip 2 frame 0 at hamming 1 and clip 1
    # frames 0,1 at hamming 1. C matches nothing. BOILER is held by
    # image 103 + clips 3,4,5 = 4 media > cap 3 -> excluded both sides.
    assert got == {(100, 1): 2, (100, 2): 1, (101, 1): 2, (101, 2): 1}

    # tighter tolerance drops the hamming-1 match
    got0 = {
        (r.image_id, r.media_id): r.n_frames
        for r in M.image_in_video(
            images, frames, max_hamming=0, max_hash_media=3
        ).collect()
    }
    assert got0 == {(100, 1): 2}


def test_audio_energy_dhash_gain_invariant(spark):
    """The energy-contour difference hash must be invariant under gain
    scaling (a volume-normalized copy fingerprints identically) and
    sensitive to contour reordering."""
    import struct

    import numpy as np

    from hash_db_spark.operators import multimodal as M

    def pcm16(samples):
        data = np.asarray(samples, dtype="<i2").tobytes()
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    rng = np.random.RandomState(7)
    base = rng.randint(-400, 400, size=80)
    rows = [
        (1, bytearray(pcm16(base))),
        (2, bytearray(pcm16(base * 2))),        # gain x2 -> same hash
        (3, bytearray(pcm16(base[::-1]))),      # reversed contour
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.id: r.dhash for r in M.audio_energy_dhash(media).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
    assert 0 <= got[1] < 1 << 60

    # a zero-sample clip (valid RIFF, empty data) hashes to 0 instead of
    # crashing on the first probe index
    empty = spark.createDataFrame(
        [(9, bytearray(pcm16([])))], "media_id long, payload binary"
    )
    assert [r.dhash for r in M.audio_energy_dhash(empty).collect()] == [0]


# --- scene cuts ----------------------------------------------------------------


def test_scene_cuts_flag_synthetic_boundary(spark):
    """A hand-built 3-frame clip: frame 1 identical to frame 0 (SAD 0,
    no cut), frame 2 inverted (SAD huge, cut)."""
    import numpy as np

    from hash_db_spark.operators import multimodal as M

    w, h = 4, 4
    f0 = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    f2 = 255 - f0
    chroma = np.full((w // 2) * (h // 2) * 2, 128, dtype=np.uint8)
    payload = b"".join(
        [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()]
        + [
            b"FRAME\n" + f.tobytes() + chroma.tobytes()
            for f in (f0, f0, f2)
        ]
    )
    media = spark.createDataFrame(
        [(7, bytearray(payload))], "media_id long, payload binary"
    )
    got = {r.frame_no: r for r in M.y4m_scene_cuts(media).collect()}
    assert got[1].sad == 0 and not got[1].is_cut
    assert got[2].sad == int(np.abs(f2.astype(int) - f0.astype(int)).sum())
    assert got[2].is_cut


def test_scene_cuts_oracle_parity(spark, sf_dir):
    import duckdb

    from hash_db_spark.operators import multimodal as M
    from hash_db_spark.queries.multimodal_queries import q_video_scene_cuts

    got = sorted(tuple(r) for r in q_video_scene_cuts(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            M.sql_y4m_scene_cuts("documents", "doc_id")
        ).fetchall()
    )
    con.close()
    assert got == want
    flags = {r[4] for r in got}
    assert flags == {True, False}  # the threshold separates real clips


# --- VAD segments ----------------------------------------------------------------


def test_vad_segments_runlength_laws(spark, sf_dir):
    """Segments tile each clip's window axis exactly (no gaps, no
    overlaps), alternate in kind, and agree with the DuckDB oracle."""
    import duckdb

    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    got = sorted(
        tuple(r)
        for r in M.wav_vad_segments(
            M.synth_wav_media(docs, "doc_id")
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            M.sql_wav_vad_segments("documents", "doc_id")
        ).fetchall()
    )
    con.close()
    assert got == want
    by_clip = {}
    for mid, seg, voiced, s, e, n in got:
        assert e - s + 1 == n
        by_clip.setdefault(mid, []).append((seg, voiced, s, e))
    for segs in by_clip.values():
        segs.sort()
        for (s1, v1, _, e1), (s2, v2, st2, _) in zip(segs, segs[1:]):
            assert s2 == s1 + 1 and st2 == e1 + 1  # tiling
            assert v2 != v1  # alternation (else same segment)
