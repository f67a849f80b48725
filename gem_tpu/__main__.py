from gem_tpu.io.cli import main

raise SystemExit(main())
