"""CLI command layer.

Behavioral parity with the reference command set (reference
nesvor/cli/commands.py:15-176): four subcommands with the same validation
rules, derived defaults (inference_batch_size = 8x batch,
n_inference_samples = 2x n_samples, reference :94-98), phase-timed
execution, and the same --registration mode mapping (:171-176). The
structure here is our own: phases are context managers rather than a
timer-list state machine, and validation goes through shared helpers.

TPU deviation: the compute dtype is bfloat16 (the reference defaults to
fp16 autocast, :98) — bf16 needs no GradScaler and is the MXU-native type.
"""

from __future__ import annotations

import argparse
import contextlib
import logging
import re
import time
from typing import Iterator, List

import jax.numpy as jnp

from ..image import Slice, Stack
from ..nesvor.sample import sample_slices, sample_volume
from ..nesvor.train import train
from ..svort.inference import svort_predict
from ..utils import log_args, makedirs
from .io import inputs, outputs


def _require(cond: bool, message: str) -> None:
    if not cond:
        raise AssertionError(message)


def _check_per_stack_args(args: argparse.Namespace) -> None:
    """Every per-stack optional list must be as long as --input-stacks."""
    n = len(args.input_stacks) if args.input_stacks is not None else 0
    for flag, human in (("stack_masks", "stack masks"), ("thicknesses", "thicknesses")):
        vals = getattr(args, flag, None)
        if vals is not None:
            _require(
                len(vals) == n,
                f"The numbers of {human} and input stacks are different!",
            )


class Command:
    """check_args -> log_args -> makedirs -> timed exec."""

    def __init__(self, args: argparse.Namespace) -> None:
        self.args = args
        self._t_start = 0.0

    # --- phase timing ---------------------------------------------------

    @contextlib.contextmanager
    def phase(self, label: str) -> Iterator[None]:
        logging.info("%s starts ...", label)
        t = time.time()
        yield
        logging.info("%s finished in %.1f s", label, time.time() - t)

    @property
    def name(self) -> str:
        """CamelCase class name -> dashed subcommand name."""
        return "-".join(
            w.lower() for w in re.findall("[A-Z][^A-Z]*", type(self).__name__)
        )

    # --- template -------------------------------------------------------

    def check_args(self) -> None:
        pass

    def main(self) -> None:
        self.check_args()
        log_args(self.args)
        makedirs(
            getattr(self.args, k, None)
            for k in ("output_slices", "simulated_slices")
        )
        t0 = time.time()
        self.exec()
        logging.info(
            "Command 'nesvor %s' finished, overall time: %.1f s",
            self.name,
            time.time() - t0,
        )

    def exec(self) -> None:
        raise NotImplementedError

    # --- shared pipeline pieces ----------------------------------------

    def load_inputs(self):
        with self.phase("Data loading"):
            return inputs(self.args)


class Reconstruct(Command):
    def check_args(self) -> None:
        args = self.args
        _require(
            args.input_slices is not None or args.input_stacks is not None,
            "No image data provided! Use --input-slices or --input-stacks "
            "to input data.",
        )
        if args.input_slices is not None:
            # slice-folder input wins; stack-related flags are dropped
            if (
                args.stack_masks is not None
                or args.input_stacks is not None
                or args.thicknesses is not None
            ):
                logging.warning(
                    "Since <input-slices> is provided, <input-stacks>, "
                    "<stack_masks> and <thicknesses> would be ignored."
                )
                args.stack_masks = args.input_stacks = args.thicknesses = None
        else:
            _check_per_stack_args(args)
        if args.output_volume is None and args.output_model is None:
            logging.warning(
                "Both <output-volume> and <output-model> are not provided."
            )
        # derived defaults (reference cli/commands.py:94-98)
        args.inference_batch_size = (
            args.inference_batch_size or 8 * args.batch_size
        )
        args.n_inference_samples = (
            args.n_inference_samples or 2 * args.n_samples
        )
        args.dtype = jnp.float32 if args.single_precision else jnp.bfloat16

    def exec(self) -> None:
        input_dict, args = self.load_inputs()
        if input_dict.get("input_stacks"):
            with self.phase("Registration"):
                slices = register(args, input_dict["input_stacks"])
        elif input_dict.get("input_slices"):
            slices = input_dict["input_slices"]
        else:
            raise ValueError("No data found!")
        with self.phase("Reconstruction"):
            model, output_slices, mask = train(slices, args)
        with self.phase("Results saving"):
            results = {
                "output_volume": sample_volume(model, mask, args),
                "mask": mask,
                "output_model": model,
                "output_slices": output_slices,
                "simulated_slices": (
                    sample_slices(model, output_slices, mask, args)
                    if getattr(args, "simulated_slices", None)
                    else []
                ),
            }
            outputs(results, args)


class SampleVolume(Command):
    def exec(self) -> None:
        input_dict, args = self.load_inputs()
        with self.phase("Volume sampling"):
            v = sample_volume(input_dict["model"], input_dict["mask"], args)
        with self.phase("Results saving"):
            outputs({"output_volume": v}, args)


class SampleSlices(Command):
    def exec(self) -> None:
        input_dict, args = self.load_inputs()
        with self.phase("Slices sampling"):
            simulated = sample_slices(
                input_dict["model"],
                input_dict["input_slices"],
                input_dict["mask"],
                args,
            )
        with self.phase("Results saving"):
            outputs({"simulated_slices": simulated}, args)


class Register(Command):
    def check_args(self) -> None:
        _check_per_stack_args(self.args)

    def exec(self) -> None:
        input_dict, args = self.load_inputs()
        if not input_dict.get("input_stacks"):
            raise ValueError("No data found!")
        with self.phase("Registration"):
            slices = register(args, input_dict["input_stacks"])
        with self.phase("Results saving"):
            outputs({"output_slices": slices}, args)


# --registration mode -> (run SVoRT, run stack VVR, force VVR result)
# (reference cli/commands.py:171-176)
_REGISTRATION_MODES = {
    "svort": (True, True, False),
    "svort-stack": (True, True, True),
    "stack": (False, True, False),
    "none": (False, False, False),
}


def register(args: argparse.Namespace, data: List[Stack]) -> List[Slice]:
    svort, vvr, force_vvr = _REGISTRATION_MODES[args.registration]
    return svort_predict(data, args.svort_version, svort, vvr, force_vvr)
