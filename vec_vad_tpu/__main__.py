from vec_vad_tpu.cli import main

raise SystemExit(main())
