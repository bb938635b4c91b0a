"""Engine-specific: the round-3 additions — real media decode (PNG
pixels, GIF frames, WAV windows, Y4M keyframes, all pure numpy),
PAA-pruned time-series similarity search, HLL sketch-table rollup,
fuzzy entity resolution, and the clamped prepaid-credit balance."""

import numpy as np
from pyspark.sql import SparkSession

import __spark_entry__ as registry
from skdist_spark.operators.multimodal import (
    audio_features,
    decode_pixels,
    encode_gif,
    encode_png,
    encode_wav_pcm16,
    encode_y4m,
    video_keyframes,
)

spark = SparkSession.builder.master("local[4]").getOrCreate()
sf = "/root/testdata/sf0.001"

# -- real pixel decode: PNG and GIF round-trip through pure numpy --
rng = np.random.default_rng(0)
img = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
fmt, back = decode_pixels(encode_png(img))
print(f"png decode: format={fmt} shape={back.shape} exact={np.array_equal(back, img)}")
palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
gif = encode_gif([rng.integers(0, 4, (6, 8), dtype=np.uint8)], palette)
fmt, back = decode_pixels(gif)
print(f"gif decode: format={fmt} shape={back.shape}")

# -- real audio + video features over a binary DataFrame --
tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)).reshape(-1, 1)
clip = encode_y4m([np.full((8, 16), 30 * i, np.uint8) for i in range(1, 4)], 16, 8)
media = spark.createDataFrame(
    [(1, bytearray(encode_wav_pcm16(tone, 8000))), (2, bytearray(clip))],
    "doc_id long, payload binary",
)
print("-- audio windows (RMS / zero-crossing rate) --")
audio_features(media).show(3)
print("-- video keyframes (mean luma / scene-change MAD) --")
video_keyframes(media).show(3)

# -- registry stops: series search, sketch rollup, ER, balance --
queries = registry.queries()
for name in (
    "user_series_topk",
    "user_sketch_rollup",
    "part_entity_resolution",
    "user_balance_resets",
    "dedup_remove_spans",
):
    print(f"-- {name} --")
    queries[name](spark, sf).show(4, truncate=40)
