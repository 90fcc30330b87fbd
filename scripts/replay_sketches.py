"""Pinned-replay oracle generator for the sketch/media rows-only queries
(VERDICT r2 next-round #4 — the extract_corpus mechanism extended).

Every rows-only query is a deterministic pure function of the input
tables, so each is replayed here WITHOUT Spark:

  * dedup_minhash_lsh / dedup_simhash — pure-Python xxhash64 (spec-exact
    XXH64, verified against F.xxhash64 in tests/test_replay_oracle.py)
    over the documents table;
  * ann_lsh_bucketed / ann_ivf — the same md5-derived hyperplanes /
    stride centroids (numpy matmul, same library the UDFs use) plus a
    pure-Python LEFT-FOLD cosine (bit-identical to the JVM
    F.aggregate fold — CLAUDE.md gotcha #16: numpy pairwise summation
    differs in the last ulp, so the rerank replay must NOT use numpy);
  * media_* — the md5-derived deterministic fakes over the fixture
    corpus (pure function of (seed=42, i), like extract_corpus).

Output: tests/golden/sketch_invariants.json.  Table-derived queries are
pinned PER INPUT (sf0.001 and sf0.01 differ in content); the oracle SQL
selects the pinned set whose data key — an md5 over the table content,
computable in both engines — matches, so the same static SQL is correct
at both gates.  Media queries are fixture-derived (sf-independent).

Run: python scripts/replay_sketches.py   (then review the JSON diff)
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import struct
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1")
OUT_PATH = os.path.join(REPO, "tests", "golden", "sketch_invariants.json")

# --- spec-exact XXH64 (pure Python; matches Spark's F.xxhash64) -------------
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    return (((acc ^ _round(0, val)) * _P1) + _P4) & _M


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 over bytes (unsigned result).  Spark's XxHash64 expression
    is exactly this per column, chained via the running hash as seed."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h = ((_rotl(h ^ _round(0, int.from_bytes(data[i:i + 8], "little")), 27)
              * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ (int.from_bytes(data[i:i + 4], "little") * _P1) & _M, 23)
              * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def spark_xxhash64(*cols) -> int:
    """F.xxhash64(c1, c2, ...) replica: seed 42, each column hashed with
    the running hash as seed.  int -> 4 LE bytes, long -> 8 LE bytes
    (tag Python ints as ('i', v) for IntegerType literals), str -> UTF-8."""
    h = 42
    for c in cols:
        if isinstance(c, tuple) and c[0] == "i":
            h = xxh64(struct.pack("<i", c[1]), h)
        elif isinstance(c, int):
            h = xxh64(struct.pack("<q", c), h)
        elif isinstance(c, str):
            h = xxh64(c.encode("utf-8"), h)
        else:  # pragma: no cover
            raise TypeError(type(c))
    return _signed(h)


# --- dedup replays (mirror operators/dedup.py) -------------------------------

def _shingles(text: str, k: int = 3) -> list[str]:
    toks = text.split(" ")
    if len(toks) >= k:
        seen, out = set(), []
        for i in range(len(toks) - k + 1):
            s = " ".join(toks[i:i + k])
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out
    return [text]


def replay_minhash(docs) -> list[list]:
    from document_extraction_service_spark.operators.dedup import (
        LSH_BANDS, MINHASH_BUCKET_CAP, MINHASH_PERMS,
    )

    rpb = MINHASH_PERMS // LSH_BANDS
    # per-permutation seed prefix: hash of the IntegerType literal j
    seeds = [xxh64(struct.pack("<i", j), 42) for j in range(MINHASH_PERMS)]
    posts: dict[tuple[int, int], set[int]] = {}
    for doc_id, text in docs:
        sh_bytes = [s.encode("utf-8") for s in _shingles(text)]
        mins = [
            min(_signed(xxh64(b, seeds[j])) for b in sh_bytes)
            for j in range(MINHASH_PERMS)
        ]
        for b in range(LSH_BANDS):
            bucket = spark_xxhash64(*mins[b * rpb:(b + 1) * rpb])
            posts.setdefault((b, bucket), set()).add(doc_id)
    pairs: dict[tuple[int, int], int] = {}
    for docset in posts.values():
        if 2 <= len(docset) <= MINHASH_BUCKET_CAP:
            ds = sorted(docset)
            for ai in range(len(ds)):
                for bi in range(ai + 1, len(ds)):
                    p = (ds[ai], ds[bi])
                    pairs[p] = pairs.get(p, 0) + 1
    return [[a, b, n] for (a, b), n in sorted(pairs.items())]


def replay_pipeline(docs) -> list[list]:
    """dedup_pipeline replay: minhash candidates -> exact (uncapped)
    Jaccard verify on candidates only -> union-find -> cluster rows."""
    from document_extraction_service_spark.operators.dedup import JACCARD_THRESHOLD

    cand = [(a, b) for a, b, _ in replay_minhash(docs)]
    sets = {doc_id: set(_shingles(text)) for doc_id, text in docs}
    verified = []
    for a, b in cand:
        inter = len(sets[a] & sets[b])
        jac = inter / (len(sets[a]) + len(sets[b]) - inter)
        if jac >= JACCARD_THRESHOLD:
            verified.append((a, b))
    return _union_find_rows(verified)


def _union_find_rows(verified: list[tuple[int, int]]) -> list[list]:
    """verified pair list -> sorted (node, cluster_id, cluster_size)
    rows (the connected_components output shape)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    members: dict[int, list[int]] = {}
    for node in {n for p in verified for n in p}:
        members.setdefault(find(node), []).append(node)
    rows = []
    for root, nodes in members.items():
        for n in nodes:
            rows.append([n, min(nodes), len(nodes)])
    return sorted(rows)


def _band_buckets(text: str, seeds, rpb: int, n_bands: int) -> list[int]:
    """The LSH band keys of one doc (mirrors dedup._minhash_bands)."""
    sh_bytes = [s.encode("utf-8") for s in _shingles(text)]
    mins = [
        min(_signed(xxh64(b, seeds[j])) for b in sh_bytes)
        for j in range(len(seeds))
    ]
    return [
        spark_xxhash64(*mins[b * rpb:(b + 1) * rpb]) for b in range(n_bands)
    ]


def replay_incremental_near(docs) -> list[list]:
    """dedup_incremental_near replay: existing-corpus band index
    (capped postings, singletons KEPT) probed by the batch's bands,
    exact full-universe Jaccard verify on candidates, dup_of = min
    verified colliding existing doc id."""
    from document_extraction_service_spark.operators.dedup import (
        INCR_NEW_MOD, JACCARD_THRESHOLD, LSH_BANDS, MINHASH_BUCKET_CAP,
        MINHASH_PERMS,
    )

    rpb = MINHASH_PERMS // LSH_BANDS
    seeds = [xxh64(struct.pack("<i", j), 42) for j in range(MINHASH_PERMS)]
    existing = [(i, t) for i, t in docs if i % INCR_NEW_MOD != 0]
    batch = [(i, t) for i, t in docs if i % INCR_NEW_MOD == 0]
    posts: dict[tuple[int, int], set[int]] = {}
    for doc_id, text in existing:
        for b, bucket in enumerate(_band_buckets(text, seeds, rpb, LSH_BANDS)):
            posts.setdefault((b, bucket), set()).add(doc_id)
    posts = {k: v for k, v in posts.items() if len(v) <= MINHASH_BUCKET_CAP}
    sets = {i: set(_shingles(t)) for i, t in docs}
    rows = []
    for doc_id, text in batch:
        cand: set[int] = set()
        for b, bucket in enumerate(_band_buckets(text, seeds, rpb, LSH_BANDS)):
            cand |= posts.get((b, bucket), set())
        hits = []
        for old in cand:
            inter = len(sets[doc_id] & sets[old])
            jac = inter / (len(sets[doc_id]) + len(sets[old]) - inter)
            if jac >= JACCARD_THRESHOLD:
                hits.append(old)
        dup = min(hits) if hits else None
        rows.append([doc_id, dup is None, dup])
    return sorted(rows, key=lambda r: r[0])


def replay_simhash(docs) -> list[list]:
    from document_extraction_service_spark.operators.dedup import (
        SIMHASH_BUCKET_CAP, SIMHASH_MAX_HAMMING,
    )

    tok_cache: dict[str, int] = {}
    sims: list[tuple[int, int]] = []
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t]
        if not toks:
            continue  # groupBy over zero exploded rows emits nothing
        bits = [0] * 64
        for t in toks:
            h = tok_cache.get(t)
            if h is None:
                h = tok_cache[t] = _signed(xxh64(t.encode("utf-8"), 42))
            for k in range(64):
                bits[k] += 1 if (h >> k) & 1 else -1
        sim = sum((1 << k) for k in range(63) if bits[k] > 0)
        sims.append((doc_id, sim))
    posts: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for doc_id, sim in sims:
        for c in range(4):
            key = (sim >> (c * 16)) & 0xFFFF
            posts.setdefault((c, key), []).append((doc_id, sim))
    out: set[tuple[int, int, int]] = set()
    for docset in posts.values():
        if 2 <= len(docset) <= SIMHASH_BUCKET_CAP:
            ds = sorted(docset)
            for ai in range(len(ds)):
                for bi in range(ai + 1, len(ds)):
                    ham = bin(ds[ai][1] ^ ds[bi][1]).count("1")
                    if ham <= SIMHASH_MAX_HAMMING:
                        out.add((ds[ai][0], ds[bi][0], ham))
    return [list(t) for t in sorted(out)]


# --- ANN replays (mirror operators/similarity.py) ----------------------------

def _fold_cosine(qv: list[float], v: list[float]) -> float:
    """The JVM F.aggregate left fold, reproduced op-for-op in Python
    floats (both are IEEE doubles with identical sequential rounding)."""
    dot = 0.0
    for x, y in zip(qv, v):
        dot = dot + (x * y)
    na = 0.0
    for x in qv:
        na = na + x * x
    nb = 0.0
    for x in v:
        nb = nb + x * x
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _floor6(x: float) -> float:
    return math.floor(x * 1e6) / 1e6


def _topk(cands: dict[int, dict[int, float]], k: int) -> list[list]:
    rows = []
    for q in sorted(cands):
        ranked = sorted(cands[q].items(), key=lambda t: (-t[1], t[0]))[:k]
        for r, (nid, cos) in enumerate(ranked, 1):
            rows.append([q, r, nid, cos])
    return rows


def replay_ann_lsh(embs) -> list[list]:
    import numpy as np

    from document_extraction_service_spark.operators import similarity as S

    ids = [vid for vid, _, _ in embs]
    mat = np.asarray([np.asarray(v, dtype=np.float64) for _, v, _ in embs])
    planes = S._auto_planes(len(embs))
    pl = S._planes(tables=S.LSH_TABLES, planes=planes)
    pow2 = np.array([2 ** k for k in range(planes)], dtype=np.int64)
    bits = (mat @ pl) >= 0
    bits = bits.reshape(len(embs), S.LSH_TABLES, planes)
    buckets = (bits * pow2).sum(axis=2).astype("int64")  # (N, T) — int64
    # like the UDF (values identical below 31 planes; dtype mirrored
    # so the replay survives the >31-plane regime too)

    by_tbl_bucket: dict[tuple[int, int], list[int]] = {}
    for row, vid in enumerate(ids):
        for t in range(S.LSH_TABLES):
            by_tbl_bucket.setdefault((t, int(buckets[row, t])), []).append(row)

    vecs = {vid: [float(x) for x in mat[row]] for row, vid in enumerate(ids)}
    cands: dict[int, dict[int, float]] = {}
    for row, vid in enumerate(ids):
        if vid >= S.N_QUERIES:
            continue
        seen: set[int] = set()
        for t in range(S.LSH_TABLES):
            bq = int(buckets[row, t])
            probes = [bq] + [bq ^ (1 << j) for j in range(planes)]
            for pb in probes:
                for crow in by_tbl_bucket.get((t, pb), ()):
                    nid = ids[crow]
                    if nid != vid and nid not in seen:
                        seen.add(nid)
        cands[vid] = {
            nid: _floor6(_fold_cosine(vecs[vid], vecs[nid])) for nid in seen
        }
    return _topk(cands, S.TOP_K)


def replay_ann_ivf(embs) -> list[list]:
    import numpy as np

    from document_extraction_service_spark.operators import similarity as S

    ids = [vid for vid, _, _ in embs]
    mat = np.asarray([np.asarray(v, dtype=np.float64) for _, v, _ in embs])
    order = {vid: row for row, vid in enumerate(ids)}
    cent_ids = sorted(vid for vid in ids if vid % S.IVF_CENTROID_STRIDE == 0)[:S.IVF_CELLS]
    cmat = np.array([mat[order[c]] for c in cent_ids], dtype=np.float64).T
    cmat = cmat / np.linalg.norm(cmat, axis=0, keepdims=True)
    cell_ids = np.array(cent_ids, dtype=np.int32)
    assigned = cell_ids[np.argmax(mat @ cmat, axis=1)]  # per-row cell

    by_cell: dict[int, list[int]] = {}
    for row, vid in enumerate(ids):
        by_cell.setdefault(int(assigned[row]), []).append(row)

    vecs = {vid: [float(x) for x in mat[row]] for row, vid in enumerate(ids)}
    cands: dict[int, dict[int, float]] = {}
    for row, vid in enumerate(ids):
        if vid >= S.N_QUERIES:
            continue
        probe = cell_ids[np.argsort(-(mat[row] @ cmat))[:S.IVF_NPROBE]]
        cands[vid] = {}
        for cid in probe:
            for crow in by_cell.get(int(cid), ()):
                nid = ids[crow]
                if nid != vid and nid not in cands[vid]:
                    cands[vid][nid] = _floor6(_fold_cosine(vecs[vid], vecs[nid]))
    return _topk(cands, S.TOP_K)


def replay_incremental_emb(embs) -> list[list]:
    """dedup_incremental_emb replay: existing-corpus sign-LSH bucket
    index (capped postings, singletons KEPT) probed by the batch's
    signatures, left-fold cosine verify >= EMB_COS_THRESHOLD, dup_of =
    min verified colliding existing vec_id."""
    import numpy as np

    from document_extraction_service_spark.operators import similarity as S
    from document_extraction_service_spark.operators.dedup import (
        EMB_COS_THRESHOLD, EMB_PIPE_BUCKET_CAP, INCR_NEW_MOD,
    )

    ids = [vid for vid, _, _ in embs]
    mat = np.asarray([np.asarray(v, dtype=np.float64) for _, v, _ in embs])
    planes = S._auto_planes(len(embs))  # full-corpus count, like the query
    pl = S._planes(tables=S.LSH_TABLES, planes=planes)
    pow2 = np.array([2 ** k for k in range(planes)], dtype=np.int64)
    bits = (mat @ pl) >= 0
    bits = bits.reshape(len(embs), S.LSH_TABLES, planes)
    buckets = (bits * pow2).sum(axis=2).astype("int64")

    posts: dict[tuple[int, int], set[int]] = {}
    for row, vid in enumerate(ids):
        if vid % INCR_NEW_MOD == 0:
            continue  # batch rows are not in the index
        for t in range(S.LSH_TABLES):
            posts.setdefault((t, int(buckets[row, t])), set()).add(vid)
    posts = {k: v for k, v in posts.items() if len(v) <= EMB_PIPE_BUCKET_CAP}

    vecs = {vid: [float(x) for x in mat[row]] for row, vid in enumerate(ids)}
    rows = []
    for row, vid in enumerate(ids):
        if vid % INCR_NEW_MOD != 0:
            continue
        cand: set[int] = set()
        for t in range(S.LSH_TABLES):
            cand |= posts.get((t, int(buckets[row, t])), set())
        hits = [o for o in cand
                if _fold_cosine(vecs[vid], vecs[o]) >= EMB_COS_THRESHOLD]
        dup = min(hits) if hits else None
        rows.append([vid, dup is None, dup])
    return sorted(rows, key=lambda r: r[0])


def replay_emb_pipeline(embs) -> list[list]:
    """dedup_embedding_pipeline replay: all-pairs sign-LSH candidates
    (numpy signatures, capped buckets) -> left-fold cosine verify ->
    union-find -> (vec_id, cluster_id, cluster_size)."""
    import numpy as np

    from document_extraction_service_spark.operators import similarity as S
    from document_extraction_service_spark.operators.dedup import (
        EMB_COS_THRESHOLD, EMB_PIPE_BUCKET_CAP,
    )

    ids = [vid for vid, _, _ in embs]
    mat = np.asarray([np.asarray(v, dtype=np.float64) for _, v, _ in embs])
    planes = S._auto_planes(len(embs))
    pl = S._planes(tables=S.LSH_TABLES, planes=planes)
    pow2 = np.array([2 ** k for k in range(planes)], dtype=np.int64)
    bits = (mat @ pl) >= 0
    bits = bits.reshape(len(embs), S.LSH_TABLES, planes)
    buckets = (bits * pow2).sum(axis=2).astype("int64")

    posts: dict[tuple[int, int], set[int]] = {}
    for row, vid in enumerate(ids):
        for t in range(S.LSH_TABLES):
            posts.setdefault((t, int(buckets[row, t])), set()).add(vid)
    cand: set[tuple[int, int]] = set()
    for vs in posts.values():
        if 2 <= len(vs) <= EMB_PIPE_BUCKET_CAP:
            sv = sorted(vs)
            for ai in range(len(sv)):
                for bi in range(ai + 1, len(sv)):
                    cand.add((sv[ai], sv[bi]))
    vecs = {vid: [float(x) for x in mat[row]] for row, vid in enumerate(ids)}
    verified = [
        (a, b) for a, b in sorted(cand)
        if _fold_cosine(vecs[a], vecs[b]) >= EMB_COS_THRESHOLD
    ]
    return _union_find_rows(verified)


# --- media replays (mirror operators/multimodal.py fakes over fixtures) ------

def _media_rows(n: int = 300):
    from document_extraction_service_spark.fixtures import gen_page

    for i in range(n):
        r = gen_page(i)
        url = r["url"]
        kind = ("image" if "/figure/" in url
                else "video" if "/tabular/" in url else "unknown")
        yield url, kind, r["html"]


def replay_media() -> dict[str, list[list]]:
    from document_extraction_service_spark.operators.multimodal import (
        FRAME_FPS, MAX_FRAMES_PER_VIDEO, _fake_audio_features,
        _fake_image_features, _fake_video_frames, sniff_magic,
    )

    feats, audio, frames, resize = [], [], [], []
    for mid, kind, payload in _media_rows():
        nb, magic = len(payload), sniff_magic(payload)
        w, h, _ = _fake_image_features(payload)
        feats.append([mid, kind, nb, magic, w, h, True])
        sr, dur, rms = _fake_audio_features(payload)
        audio.append([mid, kind, nb, magic, sr, dur, rms, True])
        if kind == "video":
            nf = _fake_video_frames(payload)
            for fi in list(range(0, nf, 8))[:MAX_FRAMES_PER_VIDEO]:
                frames.append([
                    mid, fi, fi / FRAME_FPS,
                    hashlib.md5(payload + fi.to_bytes(4, "big")).hexdigest(),
                    True, None,
                ])
        if kind == "image":
            scale = min(1.0, 256 / max(w, h))
            dw, dh = max(1, int(w * scale)), max(1, int(h * scale))
            digest = hashlib.md5(payload + f"|{dw}x{dh}".encode()).hexdigest()
            resize.append([mid, w, h, dw, dh, digest, True, None])
    return {
        "media_features": feats,
        "media_audio_features": audio,
        "media_frame_sample": frames,
        "media_resize": resize,
    }


# --- data keys (same md5 computable in DuckDB; see __spark_entry__) ----------

def doc_key(docs) -> str:
    return hashlib.md5(
        "".join(hashlib.md5(t.encode("utf-8")).hexdigest()
                for _, t in sorted(docs)).encode()
    ).hexdigest()


def emb_key(embs) -> str:
    parts = [str(math.floor(float(v[0]) * 1e6))
             for _, v, _ in sorted(embs, key=lambda t: t[0])]
    return hashlib.md5(",".join(parts).encode()).hexdigest()


def main() -> None:
    import pandas as pd

    inv: dict = {
        "dedup_minhash_lsh": {
            "columns": ["doc_a", "doc_b", "n_bands_agree"],
            "types": ["BIGINT", "BIGINT", "BIGINT"],
            "keyed": "documents", "sets": {},
        },
        "dedup_simhash": {
            "columns": ["doc_a", "doc_b", "hamming"],
            "types": ["BIGINT", "BIGINT", "INTEGER"],
            "keyed": "documents", "sets": {},
        },
        "dedup_pipeline": {
            "columns": ["doc_id", "cluster_id", "cluster_size"],
            "types": ["BIGINT", "BIGINT", "BIGINT"],
            "keyed": "documents", "sets": {},
        },
        "dedup_incremental_near": {
            "columns": ["doc_id", "novel", "dup_of"],
            "types": ["BIGINT", "BOOLEAN", "BIGINT"],
            "keyed": "documents", "sets": {},
        },
        "ann_lsh_bucketed": {
            "columns": ["query_id", "rank", "neighbor_id", "cosine"],
            "types": ["BIGINT", "INTEGER", "BIGINT", "DOUBLE"],
            "keyed": "embeddings", "sets": {},
        },
        "ann_ivf": {
            "columns": ["query_id", "rank", "neighbor_id", "cosine"],
            "types": ["BIGINT", "INTEGER", "BIGINT", "DOUBLE"],
            "keyed": "embeddings", "sets": {},
        },
        "dedup_embedding_pipeline": {
            "columns": ["vec_id", "cluster_id", "cluster_size"],
            "types": ["BIGINT", "BIGINT", "BIGINT"],
            "keyed": "embeddings", "sets": {},
        },
        "dedup_incremental_emb": {
            "columns": ["vec_id", "novel", "dup_of"],
            "types": ["BIGINT", "BOOLEAN", "BIGINT"],
            "keyed": "embeddings", "sets": {},
        },
    }
    for sf in SF_DIRS:
        d = pd.read_parquet(os.path.join(sf, "documents.parquet"))
        docs = list(zip(d["doc_id"].astype(int), d["text"]))
        e = pd.read_parquet(os.path.join(sf, "embeddings.parquet"))
        embs = [(int(r.vec_id), list(r.embedding), int(r.label))
                for r in e.itertuples(index=False)]
        dk, ek = doc_key(docs), emb_key(embs)
        print(f"{sf}: doc_key={dk} emb_key={ek}")
        inv["dedup_minhash_lsh"]["sets"][dk] = replay_minhash(docs)
        inv["dedup_simhash"]["sets"][dk] = replay_simhash(docs)
        inv["dedup_pipeline"]["sets"][dk] = replay_pipeline(docs)
        inv["dedup_incremental_near"]["sets"][dk] = replay_incremental_near(docs)
        inv["ann_lsh_bucketed"]["sets"][ek] = replay_ann_lsh(embs)
        inv["ann_ivf"]["sets"][ek] = replay_ann_ivf(embs)
        inv["dedup_embedding_pipeline"]["sets"][ek] = replay_emb_pipeline(embs)
        inv["dedup_incremental_emb"]["sets"][ek] = replay_incremental_emb(embs)

    media = replay_media()
    inv["media_features"] = {
        "columns": ["media_id", "kind", "n_bytes", "magic",
                    "width", "height", "decode_ok"],
        "types": ["VARCHAR", "VARCHAR", "BIGINT", "VARCHAR",
                  "INTEGER", "INTEGER", "BOOLEAN"],
        "rows": media["media_features"],
    }
    inv["media_audio_features"] = {
        "columns": ["media_id", "kind", "n_bytes", "magic",
                    "sample_rate", "duration_s", "rms", "decode_ok"],
        "types": ["VARCHAR", "VARCHAR", "BIGINT", "VARCHAR",
                  "INTEGER", "DOUBLE", "DOUBLE", "BOOLEAN"],
        "rows": media["media_audio_features"],
    }
    inv["media_frame_sample"] = {
        "columns": ["media_id", "frame_idx", "ts_s", "frame_digest",
                    "decode_ok", "decode_error"],
        "types": ["VARCHAR", "INTEGER", "DOUBLE", "VARCHAR",
                  "BOOLEAN", "VARCHAR"],
        "rows": media["media_frame_sample"],
    }
    inv["media_resize"] = {
        "columns": ["media_id", "src_width", "src_height", "dst_width",
                    "dst_height", "resized_digest", "decode_ok", "decode_error"],
        "types": ["VARCHAR", "INTEGER", "INTEGER", "INTEGER",
                  "INTEGER", "VARCHAR", "BOOLEAN", "VARCHAR"],
        "rows": media["media_resize"],
    }
    with open(OUT_PATH, "w") as f:
        json.dump(inv, f, separators=(",", ":"))
    sizes = {k: (sum(len(s) for s in v["sets"].values())
                 if "sets" in v else len(v["rows"])) for k, v in inv.items()}
    print(f"wrote {OUT_PATH} ({os.path.getsize(OUT_PATH)} bytes): {sizes}")


if __name__ == "__main__":
    main()
