from orc_tpu.cli import main

raise SystemExit(main())
