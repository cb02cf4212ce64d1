from overseer_spark.runner import main

raise SystemExit(main())
