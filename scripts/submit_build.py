"""spark-submit entry: the north-rule deployment shape, runnable end-to-end.

    cd /root/repo && zip -qr /tmp/plume_spark.zip plume_spark
    /opt/spark/bin/spark-submit --master local[8] \
        --py-files /tmp/plume_spark.zip \
        scripts/submit_build.py --generate 200 --store /tmp/submit-kg

The package resolves from the ``--py-files`` zip on driver and executors
(run it from any cwd — the repo checkout is not on the path), builds the
graph store through the resumable lineage path, and prints one JSON status
line including where ``plume_spark`` was imported from, so the artifact
proves the zip (not a local checkout) served the job.  On a real cluster
the identical command takes ``--master yarn``/``k8s://...`` plus
``--num-executors``; ``get_spark(master="")`` inherits that submitted conf
instead of pinning a local master.
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--generate", type=int, default=200, help="conversations to synthesize")
    p.add_argument("--store", required=True, help="graph store root directory")
    p.add_argument("--tau", type=float, default=None, help="linking similarity threshold")
    a = p.parse_args()

    import plume_spark
    from plume_spark import get_spark
    from plume_spark.generator import generate_transcripts
    from plume_spark.pipeline import build_graph
    from plume_spark.store import GraphStore

    # master="" -> inherit spark.master from the spark-submit conf
    spark = get_spark(app_name="plume-submit-build", master="")
    store = GraphStore(spark, a.store)
    stats = build_graph(generate_transcripts(spark, a.generate, seed=1), store, tau=a.tau)
    print(
        json.dumps(
            {
                "package_from": plume_spark.__file__,
                "master": spark.conf.get("spark.master"),
                "entities": store.entities.row_count(),
                "triples": store.triples.row_count(),
                **{k: v for k, v in stats.items() if isinstance(v, (int, float))},
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
