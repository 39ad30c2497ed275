"""Python worker daemon with the heavy per-worker imports preloaded.

Spark forks every Python worker process from this daemon
(`spark.python.daemon.module`, set in session.get_spark); anything imported
here is inherited by every forked worker through copy-on-write. numpy,
pandas, and pyarrow together cost ~1.5-2 s of import per worker, paid on
the first Arrow-batched UDF stage of a cold session — preloading moves that
to one import per daemon (guide §4: heavyweight init once, never per
worker). No runtime behavior changes: the same modules end up in the same
workers, just earlier.
"""

import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
