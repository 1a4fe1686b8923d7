"""Link-graph pipelines: degree rollups and PageRank over an edge
Dataset — the host-graph analytics a crawl-scale corpus pipeline runs
(seed-host scoring, spam-mass style weighting of extraction output).

The reference engine has no graph ops; these are first-class
training-data additions in the same scale discipline as the dedup
family:

* edges are the ONLY corpus-sized table and they stream through
  ``map_batches`` with per-batch partial aggregation — each exchange
  moves one row per distinct key, never one per edge;
* per-iteration rank state follows the two-tier budget rule used
  everywhere in this repo (``cluster_assign``, ``semi_join_ids``):
  a node table under ``broadcast_limit`` lives in ONE broadcast numpy
  array (``ray.put`` once, per-worker cached); above it every
  iteration is fully distributed — one :func:`~dots_ocr_ray.pipelines.
  relational.hash_join` of edges with ranks on ``src`` plus one
  ``groupby(dst)`` contribution sum, nothing driver-sized.

Multi-edges act as weights: every edge row carries one unit of its
source's rank, so out-degree is the edge-row count per source.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from dots_ocr_ray.util import bounded_blocks, cached_object


def degree_table(
    edges: ray.data.Dataset, *, src: str = "src", dst: str = "dst"
) -> ray.data.Dataset:
    """Per-node (out_deg, in_deg) from an edge Dataset in ONE keyed
    exchange: each batch pre-aggregates both directions into
    (host, out_partial, in_partial) rows, then a single groupby sums
    the partials."""

    def _partials(batch: pa.Table) -> pa.Table:
        s = batch.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        hosts = np.unique(np.concatenate([s, d]))
        out_c = np.bincount(np.searchsorted(hosts, s), minlength=len(hosts))
        in_c = np.bincount(np.searchsorted(hosts, d), minlength=len(hosts))
        return pa.table(
            {
                "host": pa.array(hosts, type=pa.int64()),
                "o": pa.array(out_c.astype(np.int64), type=pa.int64()),
                "i": pa.array(in_c.astype(np.int64), type=pa.int64()),
            }
        )

    partials = bounded_blocks(
        edges.map_batches(_partials, batch_format="pyarrow"), rows_per_block=262144
    )
    summed = partials.groupby("host").sum(["o", "i"])

    def _rename(batch: pa.Table) -> pa.Table:
        mapping = {"sum(o)": "out_deg", "sum(i)": "in_deg"}
        return batch.rename_columns([mapping.get(n, n) for n in batch.column_names])

    return summed.map_batches(_rename, batch_format="pyarrow")


def _collect_int_col(ds: ray.data.Dataset, col: str) -> np.ndarray:
    chunks = [
        b.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        for b in ds.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    return np.concatenate(chunks) if chunks else np.array([], np.int64)


def pagerank(
    edges: ray.data.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    num_iters: int = 5,
    damping: float = 0.85,
    broadcast_limit: int = 2_000_000,
) -> pa.Table:
    """PageRank over an integer-keyed edge Dataset → ``(host, rank)``
    (ranks sum to 1; dangling mass redistributed uniformly).

    Broadcast tier (|nodes| <= ``broadcast_limit``): the node/out-degree
    arrays broadcast once; every iteration streams the edges through a
    stateless ``map_batches`` that bins contributions per destination
    WITHIN the batch (searchsorted + bincount), then one
    ``groupby(node)`` sums partials into the next rank vector — the
    per-iteration driver state is O(nodes), the same budget as the
    union-find fast path in ``cluster_assign``.

    Distributed tier (above the budget): ranks live in a Dataset;
    each iteration is ``hash_join(edges, ranks, on=src)`` →
    per-batch contribution partials → ``groupby(dst).sum`` →
    left-join back onto the node table (zero-in-degree nodes keep the
    base rank).  The dangling-rank scalar is the only per-iteration
    driver value.
    """
    # the edge table is consumed once per iteration — pin it to the
    # object store so the upstream plan (reads, derivations) executes
    # exactly once, not once per iteration
    from dots_ocr_ray.util import bounded_blocks as _bb

    edges = _bb(edges.select_columns([src, dst]), rows_per_block=1_048_576).materialize()
    degrees = degree_table(edges, src=src, dst=dst).materialize()
    n_nodes = degrees.count()
    if n_nodes == 0:
        return pa.table({"host": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())})

    if n_nodes <= broadcast_limit:
        hosts_chunks, deg_chunks = [], []
        for b in degrees.iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                hosts_chunks.append(
                    b.column("host").to_numpy(zero_copy_only=False).astype(np.int64)
                )
                deg_chunks.append(
                    b.column("out_deg").to_numpy(zero_copy_only=False).astype(np.int64)
                )
        hosts = np.concatenate(hosts_chunks)
        out_deg = np.concatenate(deg_chunks)
        order = np.argsort(hosts)
        hosts, out_deg = hosts[order], out_deg[order]
        n = len(hosts)
        ranks = np.full(n, 1.0 / n)
        base = (1.0 - damping) / n

        for _ in range(num_iters):
            share = np.where(out_deg > 0, ranks / np.maximum(out_deg, 1), 0.0)
            state_ref = ray.put((hosts, share))

            def _contrib(batch: pa.Table, _ref=state_ref) -> pa.Table:
                h, sh = cached_object(_ref)
                s = batch.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
                d = batch.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
                d_nodes = np.unique(d)
                sums = np.zeros(len(d_nodes))
                np.add.at(sums, np.searchsorted(d_nodes, d), sh[np.searchsorted(h, s)])
                return pa.table(
                    {
                        "host": pa.array(d_nodes, type=pa.int64()),
                        "c": pa.array(sums, type=pa.float64()),
                    }
                )

            # partials are already per-destination-unique within each
            # batch (≤ |nodes| rows) and the driver legitimately holds
            # O(nodes) state in this tier — summing them here skips a
            # keyed exchange per iteration
            contrib = np.zeros(n)
            for b in edges.map_batches(_contrib, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            ):
                if b.num_rows:
                    idx = np.searchsorted(
                        hosts, b.column("host").to_numpy(zero_copy_only=False).astype(np.int64)
                    )
                    np.add.at(contrib, idx, b.column("c").to_numpy(zero_copy_only=False))
            dangling = float(ranks[out_deg == 0].sum())
            ranks = base + damping * (contrib + dangling / n)

        return pa.table(
            {"host": pa.array(hosts, type=pa.int64()), "rank": pa.array(ranks, type=pa.float64())}
        )

    # ---- distributed tier: ranks as a Dataset, one join + one groupby
    # per iteration ----------------------------------------------------
    from dots_ocr_ray.pipelines.relational import hash_join

    deg_schema = pa.schema([("host", pa.int64()), ("out_deg", pa.int64()), ("in_deg", pa.int64())])
    rank_schema = pa.schema([("host", pa.int64()), ("rank", pa.float64()), ("out_deg", pa.int64())])
    init = 1.0 / n_nodes
    base = (1.0 - damping) / n_nodes

    def _init(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": batch.column("host").cast(pa.int64()),
                "rank": pa.array(np.full(batch.num_rows, init), type=pa.float64()),
                "out_deg": batch.column("out_deg").cast(pa.int64()),
            },
            schema=rank_schema,
        )

    ranks_ds = degrees.map_batches(_init, batch_format="pyarrow").materialize()
    edges_schema = pa.schema([(src, pa.int64()), (dst, pa.int64())])

    for _ in range(num_iters):
        # dangling mass: one scalar aggregate
        def _dangling(batch: pa.Table) -> pa.Table:
            mask = pc.equal(batch.column("out_deg"), 0)
            s = pc.sum(batch.filter(mask).column("rank")).as_py() or 0.0
            return pa.table({"d": pa.array([float(s)], type=pa.float64())})

        dangling = sum(
            r["d"]
            for r in ranks_ds.map_batches(_dangling, batch_format="pyarrow").take_all()
        )

        def _as_src(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                [src if n == "host" else n for n in batch.column_names]
            )

        joined = hash_join(
            edges,
            ranks_ds.map_batches(_as_src, batch_format="pyarrow"),
            on=src,
            left_schema=edges_schema,
            right_schema=pa.schema(
                [(src, pa.int64()), ("rank", pa.float64()), ("out_deg", pa.int64())]
            ),
        )

        def _contrib_d(batch: pa.Table) -> pa.Table:
            d = batch.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
            r = batch.column("rank").to_numpy(zero_copy_only=False)
            o = batch.column("out_deg").to_numpy(zero_copy_only=False).astype(np.int64)
            share = np.where(o > 0, r / np.maximum(o, 1), 0.0)
            d_nodes = np.unique(d)
            sums = np.zeros(len(d_nodes))
            np.add.at(sums, np.searchsorted(d_nodes, d), share)
            return pa.table(
                {
                    "host": pa.array(d_nodes, type=pa.int64()),
                    "c": pa.array(sums, type=pa.float64()),
                }
            )

        contribs = (
            bounded_blocks(
                joined.map_batches(_contrib_d, batch_format="pyarrow"),
                rows_per_block=262144,
            )
            .groupby("host")
            .sum("c")
        )

        def _rename_c(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                ["c" if n == "sum(c)" else n for n in batch.column_names]
            )

        merged = hash_join(
            degrees,
            contribs.map_batches(_rename_c, batch_format="pyarrow"),
            on="host",
            how="left",
            left_schema=deg_schema,
            right_schema=pa.schema([("host", pa.int64()), ("c", pa.float64())]),
        )

        extra = dangling / n_nodes

        def _next(batch: pa.Table, _extra=extra) -> pa.Table:
            c = batch.column("c").to_numpy(zero_copy_only=False)
            c = np.nan_to_num(np.asarray(c, dtype=np.float64), nan=0.0)
            new_rank = base + damping * (c + _extra)
            return pa.table(
                {
                    "host": batch.column("host").cast(pa.int64()),
                    "rank": pa.array(new_rank, type=pa.float64()),
                    "out_deg": batch.column("out_deg").cast(pa.int64()),
                },
                schema=rank_schema,
            )

        ranks_ds = merged.map_batches(_next, batch_format="pyarrow").materialize()

    out = pa.concat_tables(
        [
            pa.table(
                {
                    "host": b.column("host").cast(pa.int64()),
                    "rank": b.column("rank").cast(pa.float64()),
                }
            )
            for b in ranks_ds.iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        or [pa.table({"host": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())})]
    )
    return out.take(pc.sort_indices(out, sort_keys=[("host", "ascending")]))


# ---------------------------------------------------------------------------
# deterministic host-edge fixture (driver-query input; SQL-mirrorable)

EDGE_MULTIPLIERS = (3, 7, 11)
N_HOSTS = 40


def host_edges_from_documents(sf_dir: str) -> ray.data.Dataset:
    """Deterministic host link graph derived from the documents table —
    the driver-query edge fixture (same pattern as ``canonical_urls``:
    the SQL oracle derives the identical edges independently).  Each
    document emits one edge per multiplier:
    ``src = doc_id % 40, dst = (doc_id * m) % 40``."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        srcs = np.concatenate([ids % N_HOSTS for _ in EDGE_MULTIPLIERS])
        dsts = np.concatenate([(ids * m) % N_HOSTS for m in EDGE_MULTIPLIERS])
        return pa.table(
            {
                "src": pa.array(srcs, type=pa.int64()),
                "dst": pa.array(dsts, type=pa.int64()),
            }
        )

    return docs.map_batches(_edges, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# connected components as a first-class graph query

CHAIN_HOSTS = 400
CHAIN_BLOCK = 16


def host_chain_edges_from_documents(sf_dir: str) -> ray.data.Dataset:
    """Deterministic sparse host graph for the components query: every
    document contributes the chain edge ``(h, h+1)`` for
    ``h = doc_id % 400`` unless ``h % 16 == 15`` — 25 path components
    of 16 hosts each, the worst case for label propagation (15 hops).
    The SQL oracle re-derives the same edges and closes them with a
    recursive CTE.  Duplicate edges (several docs on one host) ship
    as-is: connected components is idempotent under edge multiplicity."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = np.unique(ids % CHAIN_HOSTS)  # in-batch dedup: shuffle bytes, not docs
        h = h[h % CHAIN_BLOCK != CHAIN_BLOCK - 1]
        return pa.table(
            {
                "a": pa.array(h, type=pa.int64()),
                "b": pa.array(h + 1, type=pa.int64()),
            }
        )

    return docs.map_batches(_edges, batch_format="pyarrow")


def connected_hosts(sf_dir: str, *, method: str = "auto") -> ray.data.Dataset:
    """(host, component) over the chain fixture — the dedup family's
    :func:`~dots_ocr_ray.pipelines.dedup.cluster_assign` (driver
    union-find under the pair budget, distributed min-label
    propagation above it) exposed as a first-class graph operator;
    component = min host id of the component."""
    from dots_ocr_ray.pipelines.dedup import cluster_assign

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _hosts(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"host": pa.array(np.unique(ids % CHAIN_HOSTS), type=pa.int64())})

    hosts = (
        docs.map_batches(_hosts, batch_format="pyarrow")
        .groupby("host")
        .count()
        .select_columns(["host"])
    )
    assigned = cluster_assign(
        hosts, host_chain_edges_from_documents(sf_dir), id_col="host", method=method
    )

    def _rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["host", "component"])

    return assigned.map_batches(_rename, batch_format="pyarrow")


def inbound_anchor_stats(
    links: ray.data.Dataset,
    *,
    src_col: str = "url",
    dst_col: str = "href",
    anchor_col: str = "anchor",
) -> ray.data.Dataset:
    """Per-link-target anchor-text rollup — the inbound-anchor corpus a
    search / embedding pipeline builds from a crawl (anchor text is the
    classic EXTERNAL description of a document): for every ``href``,
    ``n_inbound`` (link rows), ``n_sources`` (distinct linking pages),
    ``n_anchors`` (distinct anchor texts) and ``top_anchor`` (most
    frequent anchor, ties → lexicographically smallest).

    Scale shape (the raw link table is never grouped whole — a hot
    target like "/" pre-aggregates inside every batch before anything
    moves):

    * exchange 1 — per-batch (href, anchor) partial counts →
      ``groupby(href, anchor).sum``; bounded by distinct pairs;
    * exchange 2 — per-batch-distinct (href, src) pairs →
      ``groupby.count`` → per-href source counts; this is the exact
      COUNT DISTINCT exchange (swap in the HLL sketch from
      functions/sketches.py when approximate source counts suffice at
      10^12 links);
    * top anchor via :func:`~dots_ocr_ray.pipelines.dedup.
      sorted_group_first` over the bounded pair-count table — no
      per-href Python reduce (one href per distinct page at web scale);
      the order key packs (max count, min anchor) into one string:
      zero-padded ``10^18 - c`` then the anchor;
    * final merge — :func:`~dots_ocr_ray.pipelines.relational.
      hash_join` of the bounded per-href tables.
    """
    from dots_ocr_ray.pipelines.dedup import sorted_group_first
    from dots_ocr_ray.pipelines.relational import hash_join

    def _pair_partials(batch: pa.Table) -> pa.Table:
        df = batch.select([dst_col, anchor_col]).to_pandas()
        vc = df.groupby([dst_col, anchor_col], sort=False).size().reset_index(name="c")
        return pa.table(
            {
                "href": pa.array(vc[dst_col].astype(str), type=pa.string()),
                "anchor": pa.array(vc[anchor_col].astype(str), type=pa.string()),
                "c": pa.array(vc["c"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    pair_counts = (
        bounded_blocks(links.map_batches(_pair_partials, batch_format="pyarrow"))
        .groupby(["href", "anchor"])
        .sum("c")
    ).materialize()  # consumed twice (per-href stats + top anchor)

    def _href_partials(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("href", sort=False)["sum(c)"].agg(["sum", "count"]).reset_index()
        return pa.table(
            {
                "href": pa.array(g["href"], type=pa.string()),
                "n_inbound": pa.array(g["sum"].to_numpy().astype(np.int64), type=pa.int64()),
                "n_anchors": pa.array(g["count"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    stats = (
        bounded_blocks(pair_counts.map_batches(_href_partials, batch_format="pyarrow"))
        .groupby("href")
        .sum(["n_inbound", "n_anchors"])
    )

    def _rename_stats(batch: pa.Table) -> pa.Table:
        mapping = {"sum(n_inbound)": "n_inbound", "sum(n_anchors)": "n_anchors"}
        return batch.rename_columns([mapping.get(n, n) for n in batch.column_names])

    stats = stats.map_batches(_rename_stats, batch_format="pyarrow")

    def _order_key(batch: pa.Table) -> pa.Table:
        c = batch.column("sum(c)").to_numpy(zero_copy_only=False).astype(np.int64)
        anchors = batch.column("anchor").to_pylist()
        keys = [f"{10**18 - int(n):019d}\x1f{a}" for n, a in zip(c, anchors)]
        return pa.table(
            {
                "href": batch.column("href"),
                "anchor": batch.column("anchor"),
                "__ord": pa.array(keys, type=pa.string()),
            }
        )

    top = sorted_group_first(
        pair_counts.map_batches(_order_key, batch_format="pyarrow"), "href", "__ord"
    )

    def _top_only(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "href": batch.column("href"),
                "top_anchor": batch.column("anchor"),
            }
        )

    top = top.map_batches(_top_only, batch_format="pyarrow")

    def _src_pairs(batch: pa.Table) -> pa.Table:
        df = batch.select([dst_col, src_col]).to_pandas().drop_duplicates()
        return pa.table(
            {
                "href": pa.array(df[dst_col].astype(str), type=pa.string()),
                "src": pa.array(df[src_col].astype(str), type=pa.string()),
            }
        )

    src_counts = (
        bounded_blocks(links.map_batches(_src_pairs, batch_format="pyarrow"))
        .groupby(["href", "src"])
        .count()
        .groupby("href")
        .count()
    )

    def _rename_src(batch: pa.Table) -> pa.Table:
        mapping = {"count()": "n_sources"}
        return batch.rename_columns([mapping.get(n, n) for n in batch.column_names])

    src_counts = src_counts.map_batches(_rename_src, batch_format="pyarrow")

    joined = hash_join(
        stats,
        src_counts,
        on="href",
        left_schema=pa.schema(
            [("href", pa.string()), ("n_inbound", pa.int64()), ("n_anchors", pa.int64())]
        ),
        right_schema=pa.schema([("href", pa.string()), ("n_sources", pa.int64())]),
    )
    joined = hash_join(
        joined,
        top,
        on="href",
        left_schema=pa.schema(
            [
                ("href", pa.string()),
                ("n_inbound", pa.int64()),
                ("n_anchors", pa.int64()),
                ("n_sources", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("href", pa.string()), ("top_anchor", pa.string())]),
    )
    return joined.select_columns(
        ["href", "n_inbound", "n_sources", "n_anchors", "top_anchor"]
    )
