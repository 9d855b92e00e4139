"""Fact-to-fact key attach with a size-gated join strategy.

``attach_order_custkey`` joins a lineitem-derived fact dataset (keyed by
``okey`` = l_orderkey) to the orders fact to attach ``o_custkey`` — the
recurring first hop of every customer-grain TPC-H-shape rollup.  orders
is O(rows), NOT a bounded dimension, so the join strategy is gated on
its actual row count (the ``MINHASH_BROADCAST_MAX_DOCS`` discipline):

* ``mode="broadcast"`` (auto when orders <= ORDERS_BROADCAST_MAX_ROWS):
  the packed (o_orderkey, o_custkey) int64 arrays ship to the object
  store ONCE (``ray.put``) and every fact batch attaches via one
  searchsorted — zero extra shuffles.  ~16 bytes/order, so the gate at
  5M rows bounds the broadcast at ~80 MB.
* ``mode="partitioned"`` (auto above the gate): the co-partitioned
  hash-join exchange (the ``denormalized_sales`` shape) — fact rows and
  orders rows union into the same ``hash(okey) % P`` partitions and the
  attach happens per partition; no stage ever holds the whole orders
  table.

Both modes FK-assert the lookup (every l_orderkey must exist in orders)
so a dangling key fails loudly instead of silently attaching a wrong
customer.  Modes are pinned equal by
tests/test_ext128_ops.py::test_hhi_join_modes_agree and
tests/test_ext130_ops.py::test_region_coverage_join_modes_agree.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ORDERS_BROADCAST_MAX_ROWS = 5_000_000


def _ray():
    import ray

    return ray


def attach_order_custkey(
    sf_dir: str,
    fact_ds,
    payload_cols: list[str],
    n_parts: int,
    mode: str | None = None,
):
    """Attach ``c`` (= o_custkey) to ``fact_ds`` rows via ``okey``.

    ``fact_ds`` must have an int64 ``okey`` column plus ``payload_cols``;
    the result has columns ``["c"] + payload_cols``.
    """
    import pyarrow.parquet as pq

    from ..stages.util import coalesce_for_shuffle
    from ..pipelines.queries import _hash_part

    ray = _ray()
    n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    if mode is None:
        mode = "broadcast" if n_orders <= ORDERS_BROADCAST_MAX_ROWS else "partitioned"
    if mode not in ("broadcast", "partitioned"):
        raise ValueError(mode)

    if mode == "broadcast":
        orders = pq.read_table(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_custkey"])
        ok = orders.column("o_orderkey").to_numpy().astype(np.int64)
        ck = orders.column("o_custkey").to_numpy().astype(np.int64)
        oorder = np.argsort(ok)
        ok, ck = ok[oorder], ck[oorder]
        oside = ray.put((ok, ck))

        def attach(batch: pa.Table) -> pa.Table:
            ok_, ck_ = ray.get(oside)
            lo = batch.column("okey").to_numpy().astype(np.int64)
            pos = np.clip(np.searchsorted(ok_, lo), 0, max(len(ok_) - 1, 0))
            assert len(ok_) and np.all(ok_[pos] == lo), \
                "FK violation: l_orderkey missing from orders"
            cols = {"c": pa.array(ck_[pos], type=pa.int64())}
            for name in payload_cols:
                cols[name] = batch.column(name)
            return pa.table(cols)

        return fact_ds.map_batches(attach, batch_format="pyarrow",
                                   zero_copy_batch=True)

    # --- co-partitioned exchange (orders never whole anywhere) -----------
    P = int(n_parts)
    sch = fact_ds.schema()  # ray.data.Schema: .names / .types (Arrow types)
    all_types = dict(zip(sch.names, sch.types))
    payload_types = {name: all_types[name] for name in payload_cols}

    def key_fact(batch: pa.Table) -> pa.Table:
        okey = batch.column("okey").to_numpy().astype(np.int64)
        cols = {
            "part": pa.array(_hash_part(okey, P), type=pa.int64()),
            "__side": pa.array(np.zeros(len(okey), np.int64)),
            "okey": pa.array(okey, type=pa.int64()),
            "c": pa.nulls(len(okey), pa.int64()),
        }
        for name in payload_cols:
            cols[name] = batch.column(name)
        return pa.table(cols)

    def key_orders(batch: pa.Table) -> pa.Table:
        okey = batch.column("o_orderkey").to_numpy().astype(np.int64)
        cols = {
            "part": pa.array(_hash_part(okey, P), type=pa.int64()),
            "__side": pa.array(np.ones(len(okey), np.int64)),
            "okey": pa.array(okey, type=pa.int64()),
            "c": pc.cast(batch.column("o_custkey"), pa.int64()),
        }
        for name in payload_cols:
            cols[name] = pa.nulls(len(okey), payload_types[name])
        return pa.table(cols)

    od = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(key_orders, batch_format="pyarrow", zero_copy_batch=True)
    fact = fact_ds.map_batches(key_fact, batch_format="pyarrow",
                               zero_copy_batch=True)

    def join_group(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy().astype(np.int64)
        keys = group.column("okey").to_numpy().astype(np.int64)
        is_dim = side == 1
        dim_keys = keys[is_dim]
        dim_cust = group.column("c").to_numpy(zero_copy_only=False)[is_dim] \
            .astype(np.int64)
        order = np.argsort(dim_keys)
        dim_sorted, cust_sorted = dim_keys[order], dim_cust[order]
        fact_tbl = group.filter(pa.array(~is_dim))
        fk = keys[~is_dim]
        cols = {}
        if len(fk):
            pos = np.clip(np.searchsorted(dim_sorted, fk), 0,
                          max(len(dim_sorted) - 1, 0))
            assert len(dim_sorted) and np.all(dim_sorted[pos] == fk), \
                "FK violation: l_orderkey missing from orders"
            cols["c"] = pa.array(cust_sorted[pos], type=pa.int64())
        else:
            cols["c"] = pa.array([], type=pa.int64())
        for name in payload_cols:
            cols[name] = fact_tbl.column(name)
        return pa.table(cols)

    return (
        coalesce_for_shuffle(fact.union(od))
        .groupby("part")
        .map_groups(lambda g: join_group(g.drop_columns(["part"])),
                    batch_format="pyarrow")
    )
