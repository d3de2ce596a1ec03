"""spark-submit entry points (north_rule: `spark-submit --py-files` on a
multi-executor cluster). Package the repo as a zip for --py-files:

    cd /root/repo && zip -r /tmp/engine.zip psyndex2linkeddata_spark
    spark-submit --py-files /tmp/engine.zip \
        -m psyndex2linkeddata_spark.jobs.convert ...   # or the file path

Locally: python -m psyndex2linkeddata_spark.jobs.convert --help
"""
