from graphframes_rs_spark.cli import main

raise SystemExit(main())
