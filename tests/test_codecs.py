"""Real PNG/JPEG codecs (operators/codecs.py): filter/coefficient
surface unit tests, independent-IDCT cross-checks, and the DuckDB
oracle parity the driver gate will run once the entries register
(r11 queue)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from hash_db_spark.operators import codecs as C


def _house_pixels(mid: int, w: int, h: int) -> np.ndarray:
    return (
        np.arange(h)[:, None, None] * 7
        + np.arange(w)[None, :, None] * 13
        + np.arange(3)[None, None, :] * 97
        + mid * 31
    ) % 256


class TestPNG:
    def test_roundtrip_all_filters(self):
        """Heights >= 5 place every filter type (r % 5) in every image;
        a pixel-exact round-trip therefore proves all five inverse
        filters, not just the easy ones."""
        for mid in range(25):
            w, h = 5 + mid % 5, 5 + mid % 3
            got_w, got_h, px = C.png_decode(C.png_encode(mid, w, h))
            assert (got_w, got_h) == (w, h)
            assert (px == _house_pixels(mid, w, h)).all()

    def test_signature_and_chunk_layout(self):
        payload = C.png_encode(1, 6, 6)
        assert payload.startswith(b"\x89PNG\r\n\x1a\n")
        assert b"IHDR" in payload and b"IDAT" in payload
        assert payload.endswith(
            b"IEND" + payload[-4:]
        ) or payload[-8:-4] == b"IEND"  # IEND + its CRC

    def test_multi_idat_concatenation(self):
        """Real-world PNGs split IDAT; the decoder must concatenate."""
        import struct
        import zlib

        payload = C.png_encode(7, 6, 6)
        # split the single IDAT into two chunks
        sig_ihdr_len = 8 + 12 + 13  # signature + IHDR chunk
        (length,) = struct.unpack_from(">I", payload, sig_ihdr_len)
        body = payload[sig_ihdr_len + 8 : sig_ihdr_len + 8 + length]
        rest = payload[sig_ihdr_len + 12 + length :]
        half = len(body) // 2
        rebuilt = (
            payload[:sig_ihdr_len]
            + C._png_chunk(b"IDAT", body[:half])
            + C._png_chunk(b"IDAT", body[half:])
            + rest
        )
        _, _, px = C.png_decode(rebuilt)
        assert (px == _house_pixels(7, 6, 6)).all()

    def test_rejects_non_png(self):
        with pytest.raises(ValueError):
            C.png_decode(b"P6\n1 1\n255\n\x00\x00\x00")

    def test_decodes_foreign_filter_choice(self):
        """A PNG filtered entirely with Paeth (not the encoder's own
        cycle) still decodes — the decoder is not coupled to the
        encoder's filter strategy."""
        import struct
        import zlib

        w = h = 6
        px = _house_pixels(9, w, h).astype(np.int64).reshape(h, -1)
        raw = bytearray()
        prev = np.zeros(w * 3, dtype=np.int64)
        for r in range(h):
            line = px[r]
            raw.append(4)  # Paeth everywhere
            for i in range(len(line)):
                a = int(line[i - 3]) if i >= 3 else 0
                c = int(prev[i - 3]) if i >= 3 else 0
                raw.append(int((line[i] - C._paeth(a, int(prev[i]), c)) % 256))
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + C._png_chunk(b"IHDR", ihdr)
            + C._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + C._png_chunk(b"IEND", b"")
        )
        _, _, got = C.png_decode(payload)
        assert (got == _house_pixels(9, w, h)).all()


def _idct_textbook(coef: np.ndarray) -> np.ndarray:
    """The T.81 A.3.3 IDCT written as explicit loops — deliberately a
    different code path from the decoder's matrix form."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[x, y] = s / 4
    return out


class TestJPEG:
    def test_dc_only_roundtrip_exact(self):
        """DC-only blocks with Q[0,0]=16 decode EXACTLY to
        128 + 2*dcq per pixel — the regime that makes a lossy codec
        oracle-checkable."""
        for mid in range(25):
            w, h = 8 * (1 + mid % 3), 8 * (1 + mid % 2)
            got_w, got_h, px = C.jpeg_decode(C.jpeg_encode(mid, w, h))
            assert (got_w, got_h) == (w, h)
            bw = w // 8
            for bi, dcq in enumerate(C.jpeg_dc_plan(mid, w, h)):
                r0, c0 = (bi // bw) * 8, (bi % bw) * 8
                assert (px[r0 : r0 + 8, c0 : c0 + 8] == 128 + 2 * int(dcq)).all()

    @pytest.mark.parametrize("ac", [7, -3, 1, -15])
    def test_ac_path_vs_textbook_idct(self, ac):
        """Run-length + magnitude + EXTEND + dequant + IDCT on blocks
        carrying an AC coefficient, checked against the loop-form IDCT."""
        mid, w, h = 3, 16, 8
        _, _, px = C.jpeg_decode(C.jpeg_encode(mid, w, h, ac_coef=ac))
        r_ac, c_ac = C._ZIGZAG[5]
        bw = w // 8
        for bi, dcq in enumerate(C.jpeg_dc_plan(mid, w, h)):
            coef = np.zeros((8, 8))
            coef[0, 0] = int(dcq) * int(C.JPEG_QTABLE[0, 0])
            coef[r_ac, c_ac] = ac * int(C.JPEG_QTABLE[r_ac, c_ac])
            exp = np.clip(np.rint(_idct_textbook(coef)) + 128, 0, 255)
            r0, c0 = (bi // bw) * 8, (bi % bw) * 8
            assert (px[r0 : r0 + 8, c0 : c0 + 8] == exp.astype(np.uint8)).all()

    def test_byte_stuffing_survives(self):
        """Scan bytes equal to 0xFF must be stuffed/unstuffed; sweep
        ids until payloads containing stuffed pairs round-trip."""
        seen_stuffed = 0
        for mid in range(120):
            for ac in (0, 7, -15, 31):
                payload = C.jpeg_encode(mid, 24, 16, ac_coef=ac)
                scan = payload[payload.rfind(b"\xff\xda") : -2]
                if b"\xff\x00" in scan:
                    seen_stuffed += 1
                    C.jpeg_decode(payload)  # must not raise
        assert seen_stuffed, "sweep never produced a stuffed byte"

    def test_rejects_progressive(self):
        payload = bytearray(C.jpeg_encode(1, 8, 8))
        i = payload.find(b"\xff\xc0")
        payload[i + 1] = 0xC2  # SOF2: progressive
        with pytest.raises(ValueError):
            C.jpeg_decode(bytes(payload))

    def test_huffman_tables_are_canonical(self):
        """Annex K tables: code lengths must be canonical-prefix-free."""
        for bits, vals in ((C._DC_BITS, C._DC_VALS), (C._AC_BITS, C._AC_VALS)):
            codes = C._huff_codes(bits, vals)
            assert len(codes) == sum(bits) == len(vals)
            # Kraft sum of a full prefix code is <= 1
            assert sum(2 ** -l for (_, l) in codes.values()) <= 1.0


class TestDecodeImageDispatch:
    def test_dispatch_png_jpeg_ppm(self):
        from hash_db_spark.operators import multimodal as M

        w, h, px = M.decode_image(C.png_encode(4, 6, 6))
        assert (w, h, px.shape[2]) == (6, 6, 3)
        w, h, px = M.decode_image(C.jpeg_encode(4, 8, 8))
        assert (w, h) == (8, 8)
        w, h, px = M.decode_image(M.ppm_encode(4, 5, 4))
        assert (w, h) == (5, 4)

    def test_unknown_format_hits_guard(self):
        from hash_db_spark.operators import multimodal as M

        if M._HAS_PIL:
            pytest.skip("PIL present: guard becomes the real fallback")
        with pytest.raises(NotImplementedError):
            M.decode_image(b"RIFF....WEBP")


class TestADPCM:
    def test_roundtrip_matches_encoder_state(self):
        """The decoder's predictor replay must equal the encoder's —
        ADPCM is lossy vs the source but bit-exact vs its own state."""
        for mid in (0, 1, 7, 63, 499):
            n = 64 + mid % 64
            rate, dec = C.adpcm_decode(C.adpcm_encode(mid, n))
            assert rate == 8000 and len(dec) == n
            pred, idx = 0, 0
            exp = []
            for s in C.adpcm_source_signal(mid, n):
                _, pred, idx = C._adpcm_step(int(s), pred, idx)
                exp.append(pred)
            assert (dec == np.array(exp, dtype=np.int16)).all()

    def test_four_to_one_compression(self):
        n = 120
        payload = C.adpcm_encode(11, n)
        assert len(payload) <= 15 + (n + 1) // 2 + 1  # header + nibbles
        assert len(payload) * 4 < n * 2 * 1.5  # ~4:1 vs PCM16

    def test_clamps_survive_extremes(self):
        """A constant full-scale step drives the predictor into the
        int16 clamp and the index into its 88 ceiling without wrapping."""
        pred, idx = 0, 0
        for _ in range(200):
            _, pred, idx = C._adpcm_step(32767, pred, idx)
        # the predictor converges exactly, then the index decays to 0
        # (code-0 samples step it down by 1 each)
        assert pred == 32767 and idx == 0
        # a full-swing alternating signal pins the index at its 88 cap
        # while the predictor stays clamped inside int16
        for k in range(100):
            s = 32767 if k % 2 == 0 else -32768
            _, pred, idx = C._adpcm_step(s, pred, idx)
            assert -32768 <= pred <= 32767
        assert idx == 88

    def test_rejects_non_adpcm(self):
        with pytest.raises(ValueError):
            C.adpcm_decode(b"RIFFxxxx")


class TestOracleParity:
    """The exact compare the driver gate runs (sorted columns, value
    grid) for the two r11-queued entries."""

    def _compare(self, spark, sf_dir, fn, oracle, tables=("documents",)):
        got = fn(spark, sf_dir).toPandas()
        con = duckdb.connect()
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        want = con.execute(oracle).df()
        got = got[sorted(got.columns)].sort_values(
            by=sorted(got.columns)
        ).reset_index(drop=True)
        want = want[sorted(want.columns)].sort_values(
            by=sorted(want.columns)
        ).reset_index(drop=True)
        assert len(got) == len(want) > 0
        for col in got.columns:
            assert (
                got[col].astype("int64").values
                == want[col].astype("int64").values
            ).all(), col

    def test_png_stats_parity(self, spark, sf_dir):
        from hash_db_spark.queries.multimodal_queries import (
            _png_decode_oracle,
            q_multimodal_png_decode,
        )

        self._compare(
            spark, sf_dir, q_multimodal_png_decode, _png_decode_oracle()
        )

    def test_jpeg_stats_parity(self, spark, sf_dir):
        from hash_db_spark.queries.multimodal_queries import (
            _jpeg_decode_oracle,
            q_multimodal_jpeg_decode,
        )

        self._compare(
            spark, sf_dir, q_multimodal_jpeg_decode, _jpeg_decode_oracle()
        )

    def test_adpcm_stats_parity(self, spark, sf_dir):
        from hash_db_spark.queries.multimodal_queries import (
            _adpcm_decode_oracle,
            q_multimodal_adpcm_decode,
        )

        self._compare(
            spark, sf_dir, q_multimodal_adpcm_decode, _adpcm_decode_oracle()
        )


class TestPngDedupIntegration:
    def test_png_dhash_pairs_parity(self, spark, sf_dir):
        """The compressed-format dedup entry: PNG decode -> dHash ->
        Hamming band pairs, exact vs the closed-form DuckDB relation."""
        import duckdb

        from hash_db_spark.queries.multimodal_queries import (
            _image_png_oracle,
            q_dedup_image_png,
        )

        got = sorted(
            tuple(r) for r in q_dedup_image_png(spark, sf_dir).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(tuple(r) for r in con.execute(_image_png_oracle()).fetchall())
        con.close()
        assert got == want and len(got) > 0

    def test_decoded_dhash_matches_direct(self, spark):
        """image_dhash_decoded over PNG payloads equals dHash computed
        on the decoder's own pixel output — and grayscale JPEG payloads
        go through the 2-D branch."""
        import pandas as pd

        from hash_db_spark.operators import codecs as C
        from hash_db_spark.operators.multimodal import dhash_from_gray

        ids = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
        png = C.synth_png_media(ids, "doc_id")
        got = {r.id: r.dhash for r in C.image_dhash_decoded(png).collect()}
        for i in range(6):
            w, h = 5 + i % 5, 5 + i % 3
            _, _, px = C.png_decode(C.png_encode(i, w, h))
            gray = px.astype("int64").sum(axis=2) // 3
            assert got[i] == dhash_from_gray(gray)
        jm = C.synth_jpeg_media(ids, "doc_id")
        jg = {r.id: r.dhash for r in C.image_dhash_decoded(jm).collect()}
        for i in range(6):
            w, h = 8 * (1 + i % 3), 8 * (1 + i % 2)
            _, _, px = C.jpeg_decode(C.jpeg_encode(i, w, h))
            assert jg[i] == dhash_from_gray(px.astype("int64"))


class TestAdpcmBatchParity:
    """The r11 optimization replaced the per-clip Python recurrence in
    the ADPCM Arrow passes with across-clip vectorized batch codecs —
    these pins prove the batch forms are BIT-identical to the scalar
    reference implementations (which stay as the spec)."""

    def test_encode_batch_byte_identical(self):
        import numpy as np

        from hash_db_spark.operators import codecs as C

        ids = np.arange(0, 200, dtype=np.int64)
        ns = 64 + ids % 64
        batch = C.adpcm_encode_batch(ids, ns)
        for i in range(len(ids)):
            assert batch[i] == C.adpcm_encode(int(ids[i]), int(ns[i]))

    def test_decode_batch_identical(self):
        import numpy as np

        from hash_db_spark.operators import codecs as C

        ids = np.arange(7, 150, dtype=np.int64)
        ns = 64 + ids % 64
        payloads = [
            C.adpcm_encode(int(i), int(n)) for i, n in zip(ids, ns)
        ]
        rates, decs = C.adpcm_decode_batch(payloads)
        for i, p in enumerate(payloads):
            r, d = C.adpcm_decode(p)
            assert r == rates[i]
            assert np.array_equal(d, decs[i])

    def test_batch_handles_mixed_lengths_and_clipping(self):
        """Clips of different lengths in one batch (mask correctness)
        and a clip long enough to exercise the int16 clamp."""
        import numpy as np

        from hash_db_spark.operators import codecs as C

        ids = np.array([0, 1, 999999], dtype=np.int64)
        ns = np.array([1, 127, 500], dtype=np.int64)
        batch = C.adpcm_encode_batch(ids, ns)
        for i in range(3):
            assert batch[i] == C.adpcm_encode(int(ids[i]), int(ns[i]))
        _, decs = C.adpcm_decode_batch(batch)
        for i, p in enumerate(batch):
            _, d = C.adpcm_decode(p)
            assert np.array_equal(d, decs[i])
