"""spark-submit entry script: the KG pipeline CLI, importable from a
--py-files zip (spark-submit can't run `-m package.module`, so this thin
file is the submittable unit; all real code lives in the zip).

    spark-submit --master local[8] --py-files dist/cortex_spark.zip \
        scripts/submit_main.py --synth 300 --out /tmp/kg_out
"""

from cortex_spark.pipeline.run import main

if __name__ == "__main__":
    main()
