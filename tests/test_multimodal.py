"""Multimodal columns: binary content + typed metadata, decode/resize/
feature/frame-sample plumbing over mapInPandas. The fake codec is the
deterministic contract; codec='real' uses PIL/soundfile when installed and
raises a clear NotImplementedError when not — both branches are covered
(skipif on the library's presence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _try_import(name: str) -> bool:
    try:
        __import__(name)
        return True
    except ImportError:
        return False


_HAS_PIL = _try_import("PIL")
_HAS_SOUNDFILE = _try_import("soundfile")


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, bytes(range(64)) * 4),   # 256 bytes -> 4 fake frames
        (2, b"\xff" * 128),          # 2 fake frames
        (3, b""),                    # empty payload
    ]
    return spark.createDataFrame(rows, "doc_id long, content binary")


class TestDecode:
    def test_decode_images_shape(self, media_df):
        from sparksearchengine_spark.operators.multimodal import decode_images

        rows = decode_images(media_df, codec="fake").collect()
        assert len(rows) == 3
        for r in rows:
            assert (r["width"], r["height"], r["n_channels"]) == (8, 8, 3)
            assert len(r["pixels"]) == 8 * 8 * 3
            assert all(0.0 <= p < 1.0 for p in r["pixels"])

    def test_decode_deterministic(self, media_df):
        from sparksearchengine_spark.operators.multimodal import decode_images

        a = {r["doc_id"]: r["pixels"] for r in decode_images(media_df).collect()}
        b = {r["doc_id"]: r["pixels"] for r in decode_images(media_df).collect()}
        assert a == b
        assert a[1] != a[2]  # different bytes -> different pixels

    def test_real_codec_raises(self, media_df):
        from sparksearchengine_spark.operators.multimodal import decode_images

        if _HAS_PIL:
            pytest.skip("PIL installed; absence branch not reachable")
        with pytest.raises(Exception, match="NotImplementedError|requires PIL"):
            decode_images(media_df, codec="real").collect()

    def test_unknown_codec_rejected(self, media_df):
        from sparksearchengine_spark.operators.multimodal import decode_images

        with pytest.raises(Exception, match="unknown codec"):
            decode_images(media_df, codec="bogus").collect()

    def test_real_codec_decodes_png(self, spark, monkeypatch):
        """The codec='real' branch runs in BOTH containers (no skip):

        * with pillow installed, a real 2x2 PNG roundtrips through the
          same mapInPandas plumbing as the fake codec;
        * without it, a minimal PIL stand-in (Image.open ->
          convert('RGB') -> __array__) is injected into sys.modules and
          _decode_image_bytes is called directly — its `from PIL import
          Image` happens at call time, so the stub exercises the exact
          real-branch code (BytesIO open, RGB convert, numpy scale to
          [0,1], ravel). The absence behavior itself is pinned by
          test_real_codec_raises above.
        """
        import sys
        import types

        import numpy as np

        if _HAS_PIL:
            import io

            from PIL import Image

            from sparksearchengine_spark.operators.multimodal import decode_images

            buf = io.BytesIO()
            Image.new("RGB", (2, 2), (255, 0, 0)).save(buf, format="PNG")
            df = spark.createDataFrame(
                [(1, buf.getvalue())], "doc_id long, content binary"
            )
            (r,) = decode_images(df, codec="real").collect()
            assert (r["width"], r["height"], r["n_channels"]) == (2, 2, 3)
            assert len(r["pixels"]) == 2 * 2 * 3
            assert r["pixels"][0] == pytest.approx(1.0)  # red channel
            assert r["pixels"][1] == pytest.approx(0.0)
            return

        class _FakeImg:
            size = (2, 2)

            def convert(self, mode):
                assert mode == "RGB"
                return self

            def __array__(self, dtype=None, copy=None):
                a = np.zeros((2, 2, 3), dtype=np.uint8)
                a[:, :, 0] = 255  # solid red
                return a.astype(dtype) if dtype else a

        fake_image_mod = types.SimpleNamespace(open=lambda fp: _FakeImg())
        fake_pil = types.ModuleType("PIL")
        fake_pil.Image = fake_image_mod
        monkeypatch.setitem(sys.modules, "PIL", fake_pil)
        monkeypatch.setitem(
            sys.modules, "PIL.Image", fake_image_mod  # type: ignore[arg-type]
        )
        content = b"\x89PNG-fake"

        from sparksearchengine_spark.operators.multimodal import (
            _decode_image_bytes,
        )

        w, h, c, px = _decode_image_bytes(content, "real")
        assert (w, h, c) == (2, 2, 3)
        assert len(px) == 12
        assert px[0] == pytest.approx(1.0) and px[1] == pytest.approx(0.0)


class TestResize:
    def test_nearest_neighbor_dims(self, media_df):
        from sparksearchengine_spark.operators.multimodal import (
            decode_images,
            resize_images,
        )

        out = resize_images(decode_images(media_df), width=4, height=2).collect()
        for r in out:
            assert (r["width"], r["height"]) == (4, 2)
            assert len(r["pixels"]) == 4 * 2 * 3

    def test_fused_resize_equals_composed(self, media_df):
        """decode_images(resize_to=...) fuses the resize into the
        decode pass (native-resolution pixels never cross Arrow — the
        warc_outlink_edges economics, r11); the result must equal the
        composed decode -> resize pipeline exactly (shared
        _resize_pixels)."""
        from sparksearchengine_spark.operators.multimodal import (
            decode_images,
            resize_images,
        )

        composed = {
            r["doc_id"]: (r["width"], r["height"], r["n_channels"], r["pixels"])
            for r in resize_images(
                decode_images(media_df), width=4, height=2
            ).collect()
        }
        fused = {
            r["doc_id"]: (r["width"], r["height"], r["n_channels"], r["pixels"])
            for r in decode_images(media_df, resize_to=(4, 2)).collect()
        }
        assert fused == composed

    def test_fused_resize_validation(self, media_df):
        from sparksearchengine_spark.operators.multimodal import decode_images

        with pytest.raises(ValueError, match="resize_to"):
            decode_images(media_df, resize_to=(0, 2))


class TestFeatures:
    def test_image_features_dim_and_determinism(self, media_df):
        from sparksearchengine_spark.operators.multimodal import image_features

        out = {r["doc_id"]: r["embedding"] for r in
               image_features(media_df, dim=32).collect()}
        assert set(out) == {1, 2, 3}
        assert all(len(v) == 32 for v in out.values())
        again = {r["doc_id"]: r["embedding"] for r in
                 image_features(media_df, dim=32).collect()}
        assert out == again

    def test_features_feed_similarity(self, media_df):
        from sparksearchengine_spark.operators.multimodal import image_features
        from sparksearchengine_spark.operators.similarity import cosine_topk

        emb = image_features(media_df, dim=16).withColumnRenamed(
            "doc_id", "vec_id"
        )
        queries = emb.where(F.col("vec_id") == 1).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        res = cosine_topk(emb, queries, k=3).collect()
        assert [r["vec_id"] for r in res if r["rank"] == 1] == [1]  # self first

    def test_audio_features(self, media_df):
        from sparksearchengine_spark.operators.multimodal import audio_features

        out = audio_features(media_df, n_bands=8).collect()
        for r in out:
            assert r["sample_rate"] == 16000
            assert len(r["embedding"]) == 8

    def test_audio_real_codec_raises_without_soundfile(self, media_df):
        from sparksearchengine_spark.operators.multimodal import audio_features

        if _HAS_SOUNDFILE:
            pytest.skip("soundfile installed; absence branch not reachable")
        with pytest.raises(
            Exception, match="NotImplementedError|requires soundfile"
        ):
            audio_features(media_df, codec="real").collect()


class TestFrameSampling:
    def test_every_n_frames(self, media_df):
        from sparksearchengine_spark.operators.multimodal import sample_frames

        out = sample_frames(media_df, every_n=2).collect()
        by_doc: dict = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
        # doc 1: 256 bytes / 64 = 4 frames -> idx 0, 2 ; doc 2: 2 frames -> 0
        assert sorted(by_doc[1]) == [0, 2]
        assert sorted(by_doc[2]) == [0]
        assert 3 not in by_doc  # empty payload -> no frames
        frame = next(r for r in out if r["doc_id"] == 1 and r["frame_idx"] == 2)
        assert len(frame["frame_bytes"]) == 64


class TestMetadata:
    def test_media_meta_struct_and_pushdown(self, spark, media_df, tmp_path):
        from sparksearchengine_spark.operators.multimodal import media_meta_expr

        df = media_df.select(
            "doc_id",
            "content",
            media_meta_expr(
                F.lit("image/png"), width=F.lit(8), height=F.lit(8)
            ).alias("media_meta"),
        )
        path = str(tmp_path / "media")
        df.write.parquet(path)
        back = spark.read.parquet(path)
        # metadata predicate must not read the binary column
        plan = back.where(F.col("media_meta.width") == 8).select(
            "doc_id", "media_meta.mime"
        )._jdf.queryExecution().executedPlan().toString()
        assert "content" not in plan
        assert plan.count("media_meta") >= 1
        assert back.where(F.col("media_meta.width") == 8).count() == 3
