"""Multimodal column walkthrough: image decode (REAL 24-bit BMP), audio
feature extraction (REAL RIFF/WAVE PCM), thumbnailing, and video frame
sampling — all as Arrow-batched mapInPandas stages over opaque binary
columns, the shape a 100 TB media table uses (payloads ride in parquet;
metadata-only queries prune the payload column at the scan).

Run: python examples/multimodal_pipeline.py
"""

import math
import sys


def build(spark):
    from flink_siddhi_spark.llm.multimodal import (
        audio_features,
        encode_bmp,
        encode_wav,
        encode_y4m,
        extract_features,
        resize_images,
        sample_frames,
    )

    # synthesize a tiny media table: two BMP images, two WAV clips, one
    # opaque "video" payload
    checker = [[(255, 255, 255) if (x + y) % 2 else (0, 0, 0)
                for x in range(8)] for y in range(8)]
    gradient = [[(x * 32, y * 32, 128) for x in range(8)] for y in range(8)]
    tone = [int(12000 * math.sin(2 * math.pi * 440 * i / 16000))
            for i in range(3200)]
    quiet = [int(500 * math.sin(2 * math.pi * 100 * i / 8000))
             for i in range(800)]
    rows = [
        (1, "image/bmp", bytearray(encode_bmp(checker))),
        (2, "image/bmp", bytearray(encode_bmp(gradient))),
        (3, "audio/wav", bytearray(encode_wav(tone))),
        (4, "audio/wav", bytearray(encode_wav(quiet, sample_rate=8000))),
        (5, "video/y4m", bytearray(encode_y4m(
            [bytes([i * 16] * (8 * 8 + 2 * 16)) for i in range(8)], 8, 8))),
    ]
    media = spark.createDataFrame(rows, "media_id long, mime string, payload binary")

    images = media.filter("mime = 'image/bmp'")
    audio = media.filter("mime = 'audio/wav'")
    video = media.filter("mime = 'video/y4m'")
    return {
        "features": extract_features(images, fake=False),
        "thumbs": resize_images(images, 4, 4, fake=False),
        "audio": audio_features(audio),
        "frames": sample_frames(video, every_n=2, fake=False),
    }


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("multimodal-example")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = build(spark)
    for r in out["features"].collect():
        print(f"image {r.media_id}: {r.n_bytes} bytes, histogram {list(r.histogram)}")
    for r in out["thumbs"].collect():
        print(f"thumb {r.media_id}: {r.width}x{r.height}, {len(r.thumb)} bytes")
    for r in out["audio"].collect():
        print(f"audio {r.media_id}: {r.sample_rate} Hz, {r.duration_s:.2f}s, "
              f"rms {r.rms:.1f}, peak {r.peak}")
    nframes = out["frames"].count()
    print(f"video frames sampled: {nframes}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
