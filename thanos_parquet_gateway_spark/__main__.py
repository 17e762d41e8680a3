from thanos_parquet_gateway_spark.cli import main

raise SystemExit(main())
