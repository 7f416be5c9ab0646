"""Composite catalog entries: the FULL weather pipeline (SURVEY.md §3) run
end-to-end on synthesized PSGC-shaped inputs, with a complete DuckDB oracle.

The fetchers injected into run_pipeline are deterministic md5-derived
functions (stdlib-only local closures — picklable by value, no package
import needed on executors), and the oracle SQL recomputes the identical
arithmetic: both engines do the same IEEE double ops in the same order, so
even unrounded coordinates hash-match.

Also: a rows-only multimodal query (binary columns + mapInPandas features —
not SQL-expressible, the driver records the weaker check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_fake_media,
    extract_audio_features,
    extract_features,
    extract_image_features,
    image_dhash,
    sample_frames,
)
from .base import Q, spread, t
from .pipeline import run_pipeline

#: One fixed op order everywhere: (h / 2^28) * span - offset.
_H28 = "('0x' || substring(md5({name}), 1, 7))::BIGINT"


def _synth_cities(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = t(spark, sf_dir, "nation")
    return nation.select(
        F.col("n_nationkey").cast("string").alias("code"),
        F.when(F.col("n_nationkey") % 3 == 0, F.concat(F.lit("City of "), F.col("n_name")))
        .otherwise(F.col("n_name"))
        .alias("name"),
        F.lit(None).cast("string").alias("oldName"),
        (F.col("n_nationkey") % 5 == 0).alias("isCapital"),
        F.col("n_regionkey").cast("string").alias("provinceCode"),
        F.lit("0").alias("districtCode"),
        F.col("n_regionkey").cast("string").alias("regionCode"),
        F.lit("luzon").alias("islandGroupCode"),
        F.concat(F.lit("0"), F.col("n_nationkey").cast("string")).alias("psgc10DigitCode"),
    )


def _synth_provinces(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = t(spark, sf_dir, "region")
    return region.select(
        F.col("r_regionkey").cast("string").alias("code"), F.col("r_name").alias("name")
    )


def _geocoder(row: dict) -> dict:
    import hashlib

    # A NULL name geocodes to nothing — the reference's get_coordinates
    # returns None when the API finds no result (weather_data_fetcher.py:
    # 132-143) and the caller carries None coordinates forward; a fake
    # fetcher must not crash where the real one degrades.
    if row["name"] is None:
        return {}
    h = int(hashlib.md5(row["name"].encode()).hexdigest()[:7], 16)
    return {
        "latitude": (h / 268435456.0) * 180.0 - 90.0,
        "longitude": (h / 268435456.0) * 360.0 - 180.0,
    }


def _weather_fetcher(row: dict) -> dict:
    import hashlib
    import json

    name = row["location_name"]
    # Same posture as _geocoder: a row that never geocoded (NULL name or
    # NULL coordinates) has no weather fetch — the reference skips the
    # API call for locations without coordinates rather than crashing.
    if name is None or row["latitude"] is None:
        return {}
    h = int(hashlib.md5(name.encode()).hexdigest()[:7], 16)
    lat = row["latitude"]
    temp = (lat / 3.0) + 20.0
    payload = {
        "weather": [
            {
                "main": ["Clear", "Clouds", "Rain"][h % 3],
                "description": ["clear sky", "scattered clouds", "light rain"][h % 3],
            }
        ],
        "main": {
            "temp": temp,
            "feels_like": temp + 2.0,
            "temp_min": temp - 1.5,
            "temp_max": temp + 1.5,
            "pressure": 1000 + h % 60,
            "humidity": h % 101,
        },
        "wind": {"speed": (h % 200) / 10.0},
        "sys": {"sunrise": 1700000000 + h % 86400, "sunset": 1700043200 + h % 86400},
    }
    if h % 5 != 0:
        payload["wind"]["deg"] = h % 360
    if h % 4 != 0:
        payload["visibility"] = 10000 - h % 500
    if h % 3 == 0:
        payload["rain"] = {"1h": (h % 50) / 10.0}
    if h % 7 != 0:
        payload["clouds"] = {"all": h % 101}
    return {"weather_json": json.dumps(payload)}


OBS_COLUMNS = (
    "location_id",
    "location_name",
    "province_name",
    "weather_main",
    "weather_description",
    "temperature_c",
    "feels_like_c",
    "temp_min_c",
    "temp_max_c",
    "pressure_hpa",
    "humidity_percent",
    "wind_speed_mps",
    "wind_direction_deg",
    "visibility_m",
    "rain_1h_mm",
    "cloudiness_percent",
    "sunrise",
    "sunset",
)


def q_weather_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    cities = _synth_cities(spark, sf_dir)
    provinces = _synth_provinces(spark, sf_dir)
    res = run_pipeline(spark, cities, provinces, None, _geocoder, _weather_fetcher)
    # data_datetime / inserted_at are wall-clock stamps (F8) — excluded so
    # the output is deterministic for the hash compare.
    return res.observations.select(*OBS_COLUMNS)


_h = _H28.format(name="name")
_PIPELINE_SQL = f"""
WITH cities AS (
  SELECT CAST(n_nationkey AS VARCHAR) AS code,
         CASE WHEN n_nationkey % 3 = 0 THEN 'City of ' || n_name
              ELSE n_name END AS name,
         CAST(n_regionkey AS VARCHAR) AS provinceCode
  FROM nation),
provinces AS (
  SELECT CAST(r_regionkey AS VARCHAR) AS code, r_name AS province_name FROM region),
merged AS (
  -- a NULL city name is the geocoder's no-result path (the reference
  -- degrades to no observation, weather_data_fetcher.py:132-143): the
  -- engine drops the city, so the oracle must too
  SELECT c.name, p.province_name, {_h} AS h
  FROM cities c LEFT JOIN provinces p ON c.provinceCode = p.code
  WHERE c.name IS NOT NULL),
geo AS (
  SELECT name, province_name, h,
         (h / 268435456.0) * 180.0 - 90.0 AS latitude,
         (h / 268435456.0) * 360.0 - 180.0 AS longitude
  FROM merged),
dim AS (
  SELECT name, province_name, latitude, h,
         row_number() OVER (ORDER BY name ASC, province_name ASC) AS location_id
  FROM geo)
SELECT location_id,
       name AS location_name,
       province_name,
       ['Clear', 'Clouds', 'Rain'][h % 3 + 1]                      AS weather_main,
       ['clear sky', 'scattered clouds', 'light rain'][h % 3 + 1]  AS weather_description,
       (latitude / 3.0) + 20.0                                     AS temperature_c,
       ((latitude / 3.0) + 20.0) + 2.0                             AS feels_like_c,
       ((latitude / 3.0) + 20.0) - 1.5                             AS temp_min_c,
       ((latitude / 3.0) + 20.0) + 1.5                             AS temp_max_c,
       CAST(1000 + h % 60 AS INTEGER)                              AS pressure_hpa,
       CAST(h % 101 AS INTEGER)                                    AS humidity_percent,
       (h % 200) / 10.0                                            AS wind_speed_mps,
       CASE WHEN h % 5 <> 0 THEN CAST(h % 360 AS INTEGER) END      AS wind_direction_deg,
       CASE WHEN h % 4 <> 0 THEN CAST(10000 - h % 500 AS INTEGER) END AS visibility_m,
       CASE WHEN h % 3 = 0 THEN (h % 50) / 10.0 ELSE 0.0 END       AS rain_1h_mm,
       CASE WHEN h % 7 <> 0 THEN CAST(h % 101 AS INTEGER) END      AS cloudiness_percent,
       TIMESTAMP '1970-01-01 00:00:00'
         + (1700000000 + h % 86400) * INTERVAL 1 SECOND            AS sunrise,
       TIMESTAMP '1970-01-01 00:00:00'
         + (1700043200 + h % 86400) * INTERVAL 1 SECOND            AS sunset
FROM dim
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns + Arrow mapInPandas feature extraction, now
    fully oracle-paired: the byte features are md5-derived and
    fold-order-deterministic, so DuckDB reproduces them bit-exactly from
    the same utf-8 blobs (see _MULTIMODAL_SQL)."""
    docs = spread(t(spark, sf_dir, "documents"))
    media = attach_fake_media(docs)
    return extract_features(media).select(
        "doc_id", "media_type", "format", "n_bytes", "byte_entropy", "checksum"
    )


# DuckDB twin of the mapInPandas feature extractor: byte histogram from the
# fixed-width hex encoding (substr pairs, ordering by hex == ordering by
# byte value), entropy as a sequential fold over ascending byte values with
# libm log2 — the identical accumulation contract the Python UDF uses.
#: Per-byte-unnest form, kept ONLY as the ground-truth reference for
#: tests/test_oracle_linearization.py (it OOM'd DuckDB at sf10 on the
#: ~1e9-row non-spillable unnest — see the row-local _MULTIMODAL_SQL
#: below, which replaced it as the strict-sweep oracle in round 8).
_MULTIMODAL_SQL_BRUTE = """
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
  FROM documents),
bytes AS (
  SELECT doc_id, n,
         unnest(list_transform(range(0, CAST(n AS INTEGER)),
                               i -> substr(h, CAST(2 * i + 1 AS INTEGER), 2))) AS bh
  FROM b),
counts AS (
  SELECT doc_id, bh, count(*) AS c, any_value(n) AS n
  FROM bytes GROUP BY doc_id, bh),
terms AS (
  SELECT doc_id,
         list(-((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                * log2(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))
              ORDER BY bh ASC) AS ts
  FROM counts GROUP BY doc_id),
ent AS (
  SELECT doc_id,
         round(list_reduce(list_concat([0.0], ts), (acc, x) -> acc + x), 6) AS e
  FROM terms)
SELECT d.doc_id,
       'image' AS media_type,
       'fake'  AS format,
       octet_length(encode(d.text)) AS n_bytes,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE coalesce(ent.e, 0.0) END AS byte_entropy,
       CAST(('0x' || substr(md5(d.text), 1, 15)) AS BIGINT) AS checksum
FROM documents d LEFT JOIN ent ON d.doc_id = ent.doc_id
"""


# The byte histogram is ROW-LOCAL (list_aggregate 'histogram' over the
# per-doc hex-pair list) instead of a corpus-wide per-byte unnest: at
# sf10 the unnest materialized ~1e9 rows on a non-spillable path and
# OOM'd DuckDB (the former measured exclusion). Entropy folds over the
# SAME byte-ascending term order (list_sort of the map entries == the
# old ORDER BY bh ASC), so the doubles are bit-identical — old-vs-new
# DuckDB equality pinned by tests/test_oracle_linearization.py.
_MULTIMODAL_SQL = """
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
  FROM documents),
hist AS (
  SELECT doc_id, n,
         list_sort(map_entries(list_aggregate(
           list_transform(range(0, CAST(n AS INTEGER)),
                          i -> substr(h, CAST(2 * i + 1 AS INTEGER), 2)),
           'histogram'))) AS ents
  FROM b WHERE n > 0),
ent AS (
  SELECT doc_id,
         round(list_reduce(list_concat([0.0],
           list_transform(ents, e ->
             -((CAST(e.value AS DOUBLE) / CAST(n AS DOUBLE))
               * log2(CAST(e.value AS DOUBLE) / CAST(n AS DOUBLE))))),
           (acc, x) -> acc + x), 6) AS e
  FROM hist)
SELECT d.doc_id,
       'image' AS media_type,
       'fake'  AS format,
       octet_length(encode(d.text)) AS n_bytes,
       -- NULL text: missing media -> missing features; empty text still
       -- has entropy 0.0 (zero bytes OBSERVED, not absent)
       CASE WHEN d.text IS NULL THEN NULL
            ELSE coalesce(ent.e, 0.0) END AS byte_entropy,
       CAST(('0x' || substr(md5(d.text), 1, 15)) AS BIGINT) AS checksum
FROM documents d LEFT JOIN ent ON d.doc_id = ent.doc_id
"""


def q_image_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through the Arrow kernel, fully oracle-paired:
    each document becomes a 4x3 P6 PPM whose 36 pixel bytes are md5-derived
    from its text (deterministic, reproducible in SQL), every 17th doc gets
    a truncated blob to exercise the corrupt-media NULL path, and
    extract_image_features decodes inside mapInPandas — dims + per-channel
    means. DuckDB recomputes the same bytes from the same hex and averages
    the same stride-3 positions, so values hash-match bit-exactly
    (12 ints summed in float64, /12, round 6 — identical on both engines).

    Scale shape: one scan, one mapInPandas stage, no shuffle — the decode
    cost is the payload, exactly as it would be on a 100 TB media corpus.
    """
    docs = spread(t(spark, sf_dir, "documents"))
    hx = F.concat(
        F.md5("text"),
        F.md5(F.concat(F.col("text"), F.lit("a"))),
        F.md5(F.concat(F.col("text"), F.lit("b"))),
    )
    pixels = F.substring(F.unhex(hx), 1, 36)
    # every 17th doc: truncated pixel payload -> decoder raises -> NULLs
    pixels = F.when(F.col("doc_id") % 17 == 0, F.substring(F.unhex(hx), 1, 10)).otherwise(
        pixels
    )
    blob = F.concat(F.encode(F.lit("P6\n4 3\n255\n"), "utf-8"), pixels)
    media = docs.select("doc_id", blob.alias("media_bytes"))
    return extract_image_features(media).select(
        "doc_id", "img_width", "img_height", "mean_r", "mean_g", "mean_b"
    )


# DuckDB twin: same 96-hex-char string, byte i = hex pair [2i, 2i+2);
# channel means average the 12 stride-3 positions per channel. Corrupt
# (truncated) rows are the doc_id % 17 = 0 lattice on both sides.
_IMAGE_DECODE_SQL = """
WITH h AS (
  SELECT doc_id, md5(text) || md5(text || 'a') || md5(text || 'b') AS hx
  FROM documents),
px AS (
  SELECT doc_id,
    list_transform(range(0, 12),
      i -> CAST(('0x' || substr(hx, CAST(6 * i + 1 AS INTEGER), 2)) AS INTEGER)) AS r,
    list_transform(range(0, 12),
      i -> CAST(('0x' || substr(hx, CAST(6 * i + 3 AS INTEGER), 2)) AS INTEGER)) AS g,
    list_transform(range(0, 12),
      i -> CAST(('0x' || substr(hx, CAST(6 * i + 5 AS INTEGER), 2)) AS INTEGER)) AS b
  FROM h)
SELECT doc_id,
  CASE WHEN doc_id % 17 = 0 THEN NULL ELSE CAST(4 AS INTEGER) END AS img_width,
  CASE WHEN doc_id % 17 = 0 THEN NULL ELSE CAST(3 AS INTEGER) END AS img_height,
  CASE WHEN doc_id % 17 = 0 THEN NULL ELSE round(list_avg(r), 6) END AS mean_r,
  CASE WHEN doc_id % 17 = 0 THEN NULL ELSE round(list_avg(g), 6) END AS mean_g,
  CASE WHEN doc_id % 17 = 0 THEN NULL ELSE round(list_avg(b), 6) END AS mean_b
FROM px
"""


def q_audio_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode through the Arrow kernel, fully oracle-paired:
    each document becomes a minimal mono 16-bit 8 kHz PCM WAV whose 8
    samples are the 16 md5(text) bytes little-endian, every 13th doc gets
    a truncated header (corrupt-media NULL path), and
    extract_audio_features decodes inside mapInPandas — rate/channels/
    duration/RMS/peak. The RMS fold is sequential on both engines
    (kernel: builtin sum; oracle: list_avg), so values hash-match
    bit-exactly. One scan, one mapInPandas stage, no shuffle.
    """
    docs = spread(t(spark, sf_dir, "documents"))
    # RIFF(52) WAVE fmt(16: PCM,mono,8kHz,16-bit) data(16)
    header_hex = (
        "52494646" "34000000" "57415645"               # RIFF 52 WAVE
        "666d7420" "10000000" "0100" "0100"            # fmt 16 PCM mono
        "401f0000" "803e0000" "0200" "1000"            # 8000Hz 16000Bps 2 16
        "64617461" "10000000"                          # data 16
    )
    wav = F.concat(F.unhex(F.lit(header_hex)), F.unhex(F.md5("text")))
    blob = F.when(F.col("doc_id") % 13 == 0, F.substring(wav, 1, 10)).otherwise(wav)
    media = docs.select("doc_id", blob.alias("media_bytes"))
    return extract_audio_features(media).select(
        "doc_id", "sample_rate", "n_channels", "duration_s", "rms", "peak"
    )


# DuckDB twin: sample i = int16-LE from md5 hex bytes [2i, 2i+1], scaled
# by 1/32768; RMS = sqrt(list_avg(squares)) — the same sequential fold the
# kernel uses. Corrupt rows are the doc_id % 13 = 0 lattice on both sides.
_AUDIO_DECODE_SQL = """
WITH h AS (
  SELECT doc_id, md5(text) AS hx FROM documents),
u AS (
  SELECT doc_id,
    list_transform(range(0, 8),
      i -> CAST(('0x' || substr(hx, CAST(4 * i + 1 AS INTEGER), 2)) AS INTEGER)
           + 256 * CAST(('0x' || substr(hx, CAST(4 * i + 3 AS INTEGER), 2)) AS INTEGER)) AS uv
  FROM h),
s AS (
  SELECT doc_id,
    list_transform(uv,
      v -> CAST(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS DOUBLE) / 32768.0) AS sv
  FROM u)
SELECT doc_id,
  CASE WHEN doc_id % 13 = 0 THEN NULL ELSE CAST(8000 AS INTEGER) END AS sample_rate,
  CASE WHEN doc_id % 13 = 0 THEN NULL ELSE CAST(1 AS INTEGER) END AS n_channels,
  CASE WHEN doc_id % 13 = 0 THEN NULL ELSE CAST(0.001 AS DOUBLE) END AS duration_s,
  CASE WHEN doc_id % 13 = 0 THEN NULL
       ELSE round(sqrt(list_avg(list_transform(sv, x -> x * x))), 6) END AS rms,
  CASE WHEN doc_id % 13 = 0 THEN NULL
       ELSE round(list_max(list_transform(sv, x -> abs(x))), 6) END AS peak
FROM s
"""


def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over 'video' columns, fully oracle-paired: each
    document becomes a 6-frame video (back-to-back 4x3 P6 frames, frame
    ``i``'s 36 pixel bytes md5-derived from text + ':f{i}'), every 19th
    doc is truncated mid-frame (corrupt videos contribute ZERO rows), and
    ``sample_frames(every_k=2)`` keeps frames 0/2/4 — each sampled frame
    then flows through the REAL image decoder for channel means.
    DuckDB rebuilds the same frames from the same hex, so the exploded
    (doc, frame) lattice and all features hash-match bit-exactly.

    Scale shape: two chained mapInPandas stages (sample, then decode),
    both partition-preserving — no shuffle anywhere; output volume is
    n_frames/k of the input, the economics of sampling before featurize.
    """
    docs = spread(t(spark, sf_dir, "documents"))

    def frame(i: int):
        tag = F.concat(F.col("text"), F.lit(f":f{i}"))
        px = F.substring(
            F.unhex(
                F.concat(
                    F.md5(tag),
                    F.md5(F.concat(tag, F.lit("a"))),
                    F.md5(F.concat(tag, F.lit("b"))),
                )
            ),
            1,
            36,
        )
        return F.concat(F.encode(F.lit("P6\n4 3\n255\n"), "utf-8"), px)

    video = F.concat(*[frame(i) for i in range(6)])
    # truncate INSIDE frame 4: frames 0-3 parse, the tail fails -> the
    # splitter rejects the whole blob (whole-file integrity contract)
    video = F.when(
        F.col("doc_id") % 19 == 0, F.substring(video, 1, 4 * 47 + 20)
    ).otherwise(video)
    media = docs.select("doc_id", video.alias("media_bytes"))
    sampled = sample_frames(media, every_k=2).select(
        "doc_id", "frame_idx", F.col("frame_bytes").alias("media_bytes")
    )
    return extract_image_features(sampled).select(
        "doc_id", "frame_idx", "mean_r", "mean_g", "mean_b"
    )


# DuckDB twin: frames 0/2/4 per non-corrupt doc; frame i's hex is the
# md5 triple of text||':fi'; channel means average the 12 stride-3 bytes.
_VIDEO_SAMPLE_SQL = """
WITH f AS (
  SELECT doc_id, unnest([0, 2, 4]) AS frame_idx,
         unnest(list_transform([0, 2, 4], i ->
           md5(text || ':f' || i) || md5(text || ':f' || i || 'a')
             || md5(text || ':f' || i || 'b'))) AS hx
  FROM documents WHERE doc_id % 19 <> 0)
SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
  round(list_avg(list_transform(range(0, 12),
    i -> CAST(('0x' || substr(hx, CAST(6 * i + 1 AS INTEGER), 2)) AS INTEGER))), 6) AS mean_r,
  round(list_avg(list_transform(range(0, 12),
    i -> CAST(('0x' || substr(hx, CAST(6 * i + 3 AS INTEGER), 2)) AS INTEGER))), 6) AS mean_g,
  round(list_avg(list_transform(range(0, 12),
    i -> CAST(('0x' || substr(hx, CAST(6 * i + 5 AS INTEGER), 2)) AS INTEGER))), 6) AS mean_b
FROM f
"""


def q_image_dhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup candidates for images: decode each (synthetic
    md5-derived) PPM in the Arrow kernel, compute the integer-grayscale
    difference hash (operators/multimodal.py::image_dhash), and report
    each image's hash bucket size — identical-looking images share a
    bucket, which is exactly the equi-join key an image dedup pass would
    join on (the image-side analogue of simhash banding; with a 9-bit
    hash on the 4x3 fixtures, buckets genuinely collide at sf0.01+).

    Shape: one scan + one mapInPandas decode stage (no shuffle), then a
    map-combinable bucket count and a hash-keyed join back. Corrupt blobs
    (the doc_id % 17 lattice) hash NULL and stay unbucketed — NULL join
    keys match nothing on either engine. 100 TB: decode cost is the
    payload; the bucket join is the keyed-equi-join shape throughout this
    repo's dedup family.
    """
    docs = spread(t(spark, sf_dir, "documents"))
    hx = F.concat(
        F.md5("text"),
        F.md5(F.concat(F.col("text"), F.lit("a"))),
        F.md5(F.concat(F.col("text"), F.lit("b"))),
    )
    pixels = F.substring(F.unhex(hx), 1, 36)
    pixels = F.when(
        F.col("doc_id") % 17 == 0, F.substring(F.unhex(hx), 1, 10)
    ).otherwise(pixels)
    blob = F.concat(F.encode(F.lit("P6\n4 3\n255\n"), "utf-8"), pixels)
    media = docs.select("doc_id", blob.alias("media_bytes"))
    hashed = image_dhash(media).select("doc_id", "dhash")
    buckets = (
        hashed.filter(F.col("dhash").isNotNull())
        .groupBy("dhash")
        .agg(F.count(F.lit(1)).alias("n_bucket"))
    )
    return hashed.join(buckets, "dhash", "left").select(
        "doc_id", "dhash", "n_bucket"
    )


# DuckDB twin: same 96-hex-char pixel string; integer grayscale
# g[j] = byte(3j) + byte(3j+1) + byte(3j+2); bit i (0..8, row-major over
# the 3x3 horizontal neighbor pairs of the 4x3 image) = g[y*4+x] > g[y*4+x+1];
# hash = MSB-first fold acc*2 + bit. All exact integers.
_IMAGE_DHASH_SQL = """
WITH h AS (
  SELECT doc_id, md5(text) || md5(text || 'a') || md5(text || 'b') AS hx
  FROM documents),
g AS (
  SELECT doc_id,
    list_transform(range(0, 12), j ->
        CAST(('0x' || substr(hx, CAST(6 * j + 1 AS INTEGER), 2)) AS BIGINT)
      + CAST(('0x' || substr(hx, CAST(6 * j + 3 AS INTEGER), 2)) AS BIGINT)
      + CAST(('0x' || substr(hx, CAST(6 * j + 5 AS INTEGER), 2)) AS BIGINT)
    ) AS gr
  FROM h),
d AS (
  SELECT doc_id,
    CASE WHEN doc_id % 17 = 0 THEN NULL ELSE
      list_reduce(
        list_concat([CAST(0 AS BIGINT)],
          list_transform(range(0, 9), i ->
            CAST(CASE WHEN gr[CAST((i // 3) * 4 + (i % 3) + 1 AS INTEGER)]
                         > gr[CAST((i // 3) * 4 + (i % 3) + 2 AS INTEGER)]
                 THEN 1 ELSE 0 END AS BIGINT))),
        (acc, x) -> acc * 2 + x)
    END AS dhash
  FROM g),
b AS (
  SELECT dhash, count(*) AS n_bucket FROM d
  WHERE dhash IS NOT NULL GROUP BY dhash)
SELECT d.doc_id, d.dhash, b.n_bucket
FROM d LEFT JOIN b ON d.dhash = b.dhash
"""


ENTRIES: dict[str, Q] = {
    "weather_pipeline_e2e": Q(
        q_weather_pipeline_e2e, _PIPELINE_SQL, "§3 full pipeline composite"
    ),
    "multimodal_features": Q(
        q_multimodal_features, _MULTIMODAL_SQL, "binary cols + mapInPandas"
    ),
    "image_decode_features": Q(
        q_image_decode_features, _IMAGE_DECODE_SQL, "real PPM decode in Arrow kernel"
    ),
    "audio_decode_features": Q(
        q_audio_decode_features, _AUDIO_DECODE_SQL, "real WAV decode in Arrow kernel"
    ),
    "video_frame_sample": Q(
        q_video_frame_sample, _VIDEO_SAMPLE_SQL, "frame sampling + per-frame decode"
    ),
    "image_dhash_buckets": Q(
        q_image_dhash_buckets,
        _IMAGE_DHASH_SQL,
        "perceptual dHash per decoded image + near-dup bucket sizes",
    ),
}
