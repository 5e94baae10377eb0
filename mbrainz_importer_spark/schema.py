"""Input/output schemas for the mbrainz entity pipeline.

Input StructTypes mirror the reference's clojure.spec contracts
(src/datomic/mbrainz/importer/entities.clj:37-51) plus observed data
(subsets/entities/*.edn). Optional spec keys => nullable fields.
UUIDs are canonical lowercase text (no native UUID type in Spark).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dt: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dt, nullable)


S = T.StringType()
L = T.LongType()

# ::artist-ent entities.clj:37-40 — required: gid, sortname, name
ARTIST = T.StructType([
    _f("gid", S, False),
    _f("name", S, False),
    _f("sortname", S, False),
    _f("type", S),
    _f("gender", S),
    _f("country", S),
    _f("begin_date_year", L),
    _f("begin_date_month", L),
    _f("begin_date_day", L),
    _f("end_date_year", L),
    _f("end_date_month", L),
    _f("end_date_day", L),
])

# ::arelease-ent entities.clj:44-45
ARELEASE = T.StructType([
    _f("gid", S, False),
    _f("name", S, False),
    _f("artist_credit", S),
    _f("type", S),
])

# ::release-ent entities.clj:41-43
RELEASE = T.StructType([
    _f("gid", S, False),
    _f("name", S, False),
    _f("release_group", S),
    _f("artist_credit", S),
    _f("label", S),
    _f("packaging", S),
    _f("status", S),
    _f("country", S),
    _f("language", S),
    _f("script", S),
    _f("barcode", S),
    _f("date_year", L),
    _f("date_month", L),
    _f("date_day", L),
    _f("acid", L),  # observed in data, dropped by transform
])

# ::label-ent entities.clj:46-48
LABEL = T.StructType([
    _f("gid", S, False),
    _f("name", S, False),
    _f("sort_name", S),
    _f("type", S),
    _f("country", S),
    _f("begin_date_year", L),
    _f("begin_date_month", L),
    _f("begin_date_day", L),
    _f("end_date_year", L),
    _f("end_date_month", L),
    _f("end_date_day", L),
])

# ::release-artist-ent entities.clj:51
RELEASE_ARTIST = T.StructType([
    _f("release", S, False),
    _f("artist", S, False),
])

# importer.clj:143-146
ARELEASE_ARTIST = T.StructType([
    _f("release_group", S, False),
    _f("artist", S, False),
])

# observed artist-credits.edn
ARTIST_CREDIT = T.StructType([
    _f("acid", L, False),
    _f("name", S, False),
])

# ::medium-ent entities.clj:49-50 + attr maps importer.clj:121-136
# One row per track, clustered by medium id.
MEDIUM_TRACK = T.StructType([
    _f("id", L, False),
    _f("release", S, False),
    _f("position", L, False),
    _f("track_count", L, False),
    _f("format", S),
    _f("name", S, False),
    _f("tracknum", L, False),
    _f("length", L),
    _f("artist", S, False),
])

ENTITY_SCHEMAS: dict[str, T.StructType] = {
    "artists": ARTIST,
    "areleases": ARELEASE,
    "releases": RELEASE,
    "labels": LABEL,
    "releases-artists": RELEASE_ARTIST,
    "areleases-artists": ARELEASE_ARTIST,
    "artist-credits": ARTIST_CREDIT,
    "media": MEDIUM_TRACK,
}

# flattened dim rows (enums.edn / countries.edn / langs.edn / scripts.edn)
ENUM_DIM = T.StructType([
    _f("enum_type", S, False),   # e.g. "artist_type"
    _f("value", S, False),       # e.g. "Person"
    _f("ident", S, False),       # e.g. ":artist.type/person"
])

SUPER_ENUM_DIM = T.StructType([
    _f("table", S, False),       # countries | langs | scripts
    _f("code", S, False),
    _f("name", S, False),
    _f("ident", S, False),
])
