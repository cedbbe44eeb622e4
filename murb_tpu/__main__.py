from murb_tpu.cli import main

raise SystemExit(main())
