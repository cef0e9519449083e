from sdr_tpu.cli import main

raise SystemExit(main())
