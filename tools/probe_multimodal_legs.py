"""Per-leg split of multimodal_decode (the r12 report's "Not yet optimized
#3"): each of the six decode legs drained alone with the noop sink on one
warm session, then the full joined entry. Separates fixture ENCODE cost
(attach_*_media) from DECODE cost (extract_*_features) for the two legs
suspected hottest (hierjpeg, webp) by also draining the attach stage alone.
Exploratory instrument — prints JSON to stdout.

Usage: python tools/probe_multimodal_legs.py [sf_dir] [reps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def _drain(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions",
                "-XX:TieredStopAtLevel=1 -XX:ReservedCodeCacheSize=512m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("probe-multimodal-legs")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_diff_spark import workload as W
    from data_diff_spark.functions import multimodal as MM

    W.load_views(spark, sf_dir)
    docs = spark.table("documents")
    out = {"sf_dir": sf_dir, "reps": reps, "stages": {}}

    def stage(name, build):
        ts = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"probe:mm:{name}")
            t0 = time.time()
            _drain(build())
            ts.append(round(time.time() - t0, 3))
        out["stages"][name] = {"times": ts, "min": min(ts)}
        print(f"{name:32s} {ts}", file=sys.stderr)

    # warm the python workers once
    _drain(MM.attach_fake_media(docs))

    legs = [
        ("fake", lambda: MM.extract_features(MM.attach_fake_media(docs))),
        ("ppm", lambda: MM.extract_image_features(MM.attach_ppm_media(docs))),
        ("wav", lambda: MM.extract_audio_features(MM.attach_wav_media(docs))),
        ("webp", lambda: MM.extract_image_features(MM.attach_webp_media(docs))),
        ("gifbmp", lambda: MM.extract_image_features(MM.attach_gif_bmp_media(docs))),
        ("hierjpeg", lambda: MM.extract_image_features(MM.attach_hierjpeg_media(docs))),
    ]
    for name, build in legs:
        stage(f"leg:{name}", build)

    # encode-only stages for the legs where encode is nontrivial
    for name, attach in [
        ("webp", MM.attach_webp_media),
        ("gifbmp", MM.attach_gif_bmp_media),
        ("hierjpeg", MM.attach_hierjpeg_media),
        ("ppm", MM.attach_ppm_media),
        ("wav", MM.attach_wav_media),
    ]:
        stage(f"encode:{name}", lambda a=attach: a(docs))

    # the full entry as the bench drains it
    stage("entry:multimodal_decode",
          lambda: W.q_multimodal_decode_all(spark, sf_dir))

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
