from geneevolve_tpu.cli import main

raise SystemExit(main())
