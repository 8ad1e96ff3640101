"""Serve a trained generator over HTTP with dynamic batching.

    python -m fpsg_tpu.cli.serve --eval_model model_epoch_500 \
        --name run0 --port 8000 --max_batch 32 --max_wait_ms 5

Optionally pre-register classes at startup from .npy support-cloud
files (name taken from the file stem):

    python -m fpsg_tpu.cli.serve ... --support_dir ./supports/

Endpoints and the batching design: fpsg_tpu/serve_http.py docstring.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from fpsg_tpu.config import add_train_flags, config_from_args
from fpsg_tpu.serve import Generator
from fpsg_tpu.serve_http import BatchingEngine, make_server


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_train_flags(parser)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--img_size", type=int, default=224)
    parser.add_argument("--max_batch", type=int, default=32)
    parser.add_argument("--max_wait_ms", type=float, default=5.0)
    parser.add_argument("--support_dir", type=str, default="",
                        help="Directory of <class>.npy (S, N, 3) support "
                             "clouds to register at startup;")
    parser.add_argument("--int8", action="store_true",
                        help="int8-quantize the VGG image encoder for "
                             "serving (post-training, per-channel weights "
                             "+ dynamic activations; fpsg_tpu/serve_quant"
                             ".py). Prototype/decoder stay full precision.")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)
    conf = config_from_args(args)

    ckpt = None
    if conf.eval_model != "NONE":
        ckpt = os.path.join(conf.model_path, conf.name, conf.eval_model)
    gen = Generator.from_checkpoint(conf, ckpt, img_size=args.img_size)
    if args.int8:
        from fpsg_tpu.serve_quant import QuantizedGenerator

        gen = QuantizedGenerator(gen)
        print("int8 image encoder enabled (per-channel weight quant, "
              "dynamic per-tensor activations)")
    engine = BatchingEngine(
        gen, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        seed=conf.seed).start()

    for path in sorted(glob.glob(os.path.join(args.support_dir, "*.npy"))
                       if args.support_dir else []):
        name = os.path.splitext(os.path.basename(path))[0]
        dim = engine.register_class(name, np.load(path))
        print(f"registered class {name!r} (dim {dim}) from {path}")

    srv = make_server(engine, args.host, args.port, verbose=args.verbose)
    print(f"serving on http://{srv.server_address[0]}:"
          f"{srv.server_address[1]} (max_batch {args.max_batch}, "
          f"max_wait {args.max_wait_ms} ms)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        engine.stop()


if __name__ == "__main__":
    main()
