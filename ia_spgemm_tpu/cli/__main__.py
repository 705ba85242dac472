from ia_spgemm_tpu.cli.main import main

raise SystemExit(main())
