"""spark-submit primary script: the package itself arrives via
--py-files (otel2pv_spark.zip on the driver's and executors'
sys.path), so this launcher only needs the absolute import."""

from otel2pv_spark.job import main

if __name__ == "__main__":
    main()
