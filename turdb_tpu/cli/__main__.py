from turdb_tpu.cli.repl import main

raise SystemExit(main())
