from diral_tpu.train.cli import main

main()
