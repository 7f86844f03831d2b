from pythongis_ray.cli import main

raise SystemExit(main())
