from deepvcp_tpu.train.cli import main

main()
