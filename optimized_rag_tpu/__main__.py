from optimized_rag_tpu.cli import main

raise SystemExit(main())
