"""DressCode inference CLI — surface parity with the reference's separate
inference_dc.py entry point; delegates to cli/infer.py with
--dataset dresscode (reference: inference_dc.py main()).
"""

from idmvton_tpu.cli.infer import main as _main


def main(argv=None):
    argv = list(argv) if argv is not None else None
    import sys
    args = argv if argv is not None else sys.argv[1:]
    _main(["--dataset", "dresscode"] + args)


if __name__ == "__main__":
    main()
