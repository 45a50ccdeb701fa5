"""Engine configuration (mirrors the reference's `config.ini` semantics).

The reference's knobs (`config.ini` + `scrc/preprocessors/
abstract_preprocessor.py:46-48`): languages, chunk size, incremental
`process_new_files_only`, debug row caps.  Spark subsumes chunking with
partitioning, so the chunk knob becomes partition hints; everything
else maps one-to-one.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # `[general] languages` — the pipeline processes these
    languages: tuple[str, ...] = ("de", "fr", "it")
    # `process_new_files_only` — manifest anti-join vs full rebuild
    process_new_files_only: bool = True
    # debug caps (`dataset_creator.py:155-156`: 100 debug / 1M real)
    debug: bool = False
    debug_row_cap: int = 100
    # partition hints (replaces `[general] chunksize`): passed to
    # session conf, not hand-scheduled
    shuffle_partitions: int = 32
    arrow_batch_size: int = 4096
    # split boundaries (`dataset_creator.py:158-159`)
    train_start: int = 1900
    val_start: int = 2016
    test_start: int = 2018
    secret_start: int = 2023
    seed: int = 42

    @classmethod
    def from_env(cls) -> "EngineConfig":
        return cls(
            shuffle_partitions=int(
                os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
            ),
            debug=os.environ.get("SPARK_GRAFT_DEBUG", "") == "1",
        )

    def session_conf(self) -> dict[str, str]:
        return {
            "spark.sql.shuffle.partitions": str(self.shuffle_partitions),
            "spark.sql.execution.arrow.maxRecordsPerBatch": str(
                self.arrow_batch_size
            ),
        }
