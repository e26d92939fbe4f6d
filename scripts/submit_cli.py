"""spark-submit entry point for the conflation CLI.

``spark-submit`` runs a script file, not ``-m`` modules, so this shim is
the cluster-side main:

    python scripts/make_pyfiles_zip.py osm_conflate_spark.zip
    spark-submit --master <cluster> --py-files osm_conflate_spark.zip \
        scripts/submit_cli.py --pages <in> --osm <in> --out <out>

The package itself arrives on every executor via ``--py-files``; the
driver imports it from the same archive (spark-submit puts the zip on
the driver's sys.path before running this script).
"""

from osm_conflate_spark.cli import main

if __name__ == "__main__":
    main()
