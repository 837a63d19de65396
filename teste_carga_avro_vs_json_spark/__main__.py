"""``python -m teste_carga_avro_vs_json_spark`` — O18 dispatcher."""

import sys

from teste_carga_avro_vs_json_spark.cli import main

sys.exit(main())
