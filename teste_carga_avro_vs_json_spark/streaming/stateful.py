"""Custom stateful streaming operator: per-partition sequence auditing.

The reference consumer trusts Kafka ordering and counts records; a
production consumer also wants to know *what went missing*. This
operator keeps per-partition state (rows seen, highest sequence,
missing-sequence count) across micro-batches with
``applyInPandasWithState`` — the engine's representative of the
"custom stateful operator" class (arbitrary state the built-in
windowed aggs can't express).

Semantics: within partition p of a round-robin-routed topic
(particao = (seq-1) % P, ProdutorAvro.java:67-70), consecutive
sequences differ by exactly ``stride`` (= P). Every missing step is a
lost/unreceived message: ``n_faltando += (seq - prev - stride) //
stride`` for in-order arrivals; out-of-order arrivals below the
watermark of ``prev`` count in ``n_fora_de_ordem``.

State is O(1) per partition (three longs) — at 100 TB with thousands
of partitions the state store holds kilobytes; batches stream through
Arrow without accumulating.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

AUDIT_OUT = StructType(
    [
        StructField("particao", IntegerType()),
        StructField("total_linhas", LongType()),
        StructField("max_seq", LongType()),
        StructField("n_faltando", LongType()),
        StructField("n_fora_de_ordem", LongType()),
    ]
)

AUDIT_STATE = StructType(
    [
        StructField("total", LongType()),
        StructField("max_seq", LongType()),
        StructField("faltando", LongType()),
        StructField("fora", LongType()),
    ]
)


def _audit_fn(stride: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (particao,) = key
        if state.exists:
            total, max_seq, faltando, fora = state.get
        else:
            total, max_seq, faltando, fora = 0, -1, 0, 0
        for pdf in pdfs:
            # ascending-by-arrival within the batch; we sort to make the
            # within-batch walk deterministic, then flag cross-batch
            # regressions as out-of-order
            for seq in sorted(int(s) for s in pdf["sequencia"]):
                total += 1
                if max_seq < 0:
                    max_seq = seq
                elif seq > max_seq:
                    faltando += (seq - max_seq - stride) // stride
                    max_seq = seq
                else:
                    fora += 1
        state.update((total, max_seq, faltando, fora))
        yield pd.DataFrame(
            [
                {
                    "particao": particao,
                    "total_linhas": total,
                    "max_seq": max_seq,
                    "n_faltando": faltando,
                    "n_fora_de_ordem": fora,
                }
            ]
        )

    return fn


def auditoria_sequencia(
    routed_stream: DataFrame, num_particoes: int = 18
) -> DataFrame:
    """Streaming per-partition sequence audit. Input needs columns
    (particao int, sequencia long); emits the running totals per
    partition each micro-batch (update mode)."""
    return routed_stream.groupBy("particao").applyInPandasWithState(
        _audit_fn(num_particoes),
        outputStructType=AUDIT_OUT,
        stateStructType=AUDIT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
