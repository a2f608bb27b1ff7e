"""Command template + subcommand implementations (rebuild of reference
nesvor/cli/commands.py:15-176): check_args -> log_args -> makedirs -> timed
exec, with the same derived defaults."""

from __future__ import annotations

import argparse
import logging
import re
import time
from typing import List, Optional, Tuple

import jax.numpy as jnp

from ..image import Slice, Stack
from ..nesvor.sample import sample_slices, sample_volume
from ..nesvor.train import train
from ..svort.inference import svort_predict
from ..utils import log_args, makedirs
from .io import inputs, outputs


class Command:
    def __init__(self, args: argparse.Namespace) -> None:
        self.args = args
        self.timer: List[Tuple[Optional[str], float]] = []

    def check_args(self) -> None:
        pass

    def get_command(self) -> str:
        return "-".join(
            w.lower() for w in re.findall("[A-Z][^A-Z]*", self.__class__.__name__)
        )

    def new_timer(self, name: Optional[str] = None) -> None:
        t = time.time()
        if len(self.timer) > 1 and self.timer[-1][0] is not None:
            logging.info(
                "%s finished in %.1f s", self.timer[-1][0], t - self.timer[-1][1]
            )
        if name is None:
            if len(self.timer) == 0:
                pass
            else:
                logging.info(
                    "Command 'nesvor %s' finished, overall time: %.1f s",
                    self.get_command(),
                    t - self.timer[0][1],
                )
        else:
            logging.info("%s starts ...", name)
        self.timer.append((name, t))

    def makedirs(self) -> None:
        keys = ["output_slices", "simulated_slices"]
        makedirs([getattr(self.args, k, None) for k in keys])

    def main(self) -> None:
        self.check_args()
        log_args(self.args)
        self.makedirs()
        self.new_timer()
        self.exec()
        self.new_timer()

    def exec(self) -> None:
        raise NotImplementedError("The exec method for Command is not implemented.")


class Reconstruct(Command):
    def check_args(self) -> None:
        assert (
            self.args.input_slices is not None or self.args.input_stacks is not None
        ), "No image data provided! Use --input-slices or --input-stacks to input data."
        if self.args.input_slices is not None:
            if (
                self.args.stack_masks is not None
                or self.args.input_stacks is not None
                or self.args.thicknesses is not None
            ):
                logging.warning(
                    "Since <input-slices> is provided, <input-stacks>, "
                    "<stack_masks> and <thicknesses> would be ignored."
                )
                self.args.stack_masks = None
                self.args.input_stacks = None
                self.args.thicknesses = None
        else:
            if self.args.stack_masks is not None:
                assert len(self.args.stack_masks) == len(
                    self.args.input_stacks
                ), "The numbers of stack masks and input stacks are different!"
            if self.args.thicknesses is not None:
                assert len(self.args.thicknesses) == len(
                    self.args.input_stacks
                ), "The numbers of thicknesses and input stacks are different!"
        if self.args.output_volume is None and self.args.output_model is None:
            logging.warning(
                "Both <output-volume> and <output-model> are not provided."
            )
        # derived defaults (reference cli/commands.py:94-98)
        if not self.args.inference_batch_size:
            self.args.inference_batch_size = 8 * self.args.batch_size
        if not self.args.n_inference_samples:
            self.args.n_inference_samples = 2 * self.args.n_samples
        self.args.dtype = (
            jnp.float32 if self.args.single_precision else jnp.bfloat16
        )

    def exec(self) -> None:
        self.new_timer("Data loading")
        input_dict, args = inputs(self.args)
        if input_dict.get("input_stacks"):
            self.new_timer("Registration")
            slices = register(args, input_dict["input_stacks"])
        elif input_dict.get("input_slices"):
            slices = input_dict["input_slices"]
        else:
            raise ValueError("No data found!")
        self.new_timer("Reconstruction")
        model, output_slices, mask = train(slices, args)
        self.new_timer("Results saving")
        output_volume = sample_volume(model, mask, args)
        simulated_slices = (
            sample_slices(model, output_slices, mask, args)
            if getattr(args, "simulated_slices", None)
            else []
        )
        outputs(
            {
                "output_volume": output_volume,
                "mask": mask,
                "output_model": model,
                "output_slices": output_slices,
                "simulated_slices": simulated_slices,
            },
            args,
        )


class SampleVolume(Command):
    def exec(self) -> None:
        self.new_timer("Data loading")
        input_dict, args = inputs(self.args)
        self.new_timer("Volume sampling")
        v = sample_volume(input_dict["model"], input_dict["mask"], args)
        self.new_timer("Results saving")
        outputs({"output_volume": v}, args)


class SampleSlices(Command):
    def exec(self) -> None:
        self.new_timer("Data loading")
        input_dict, args = inputs(self.args)
        self.new_timer("Slices sampling")
        simulated_slices = sample_slices(
            input_dict["model"], input_dict["input_slices"], input_dict["mask"], args
        )
        self.new_timer("Results saving")
        outputs({"simulated_slices": simulated_slices}, args)


class Register(Command):
    def check_args(self) -> None:
        if self.args.stack_masks is not None:
            assert len(self.args.stack_masks) == len(
                self.args.input_stacks
            ), "The numbers of stack masks and input stacks are different!"
        if self.args.thicknesses is not None:
            assert len(self.args.thicknesses) == len(
                self.args.input_stacks
            ), "The numbers of thicknesses and input stacks are different!"

    def exec(self) -> None:
        self.new_timer("Data loading")
        input_dict, args = inputs(self.args)
        if not input_dict.get("input_stacks"):
            raise ValueError("No data found!")
        self.new_timer("Registration")
        slices = register(args, input_dict["input_stacks"])
        self.new_timer("Results saving")
        outputs({"output_slices": slices}, args)


def register(args: argparse.Namespace, data: List[Stack]) -> List[Slice]:
    """--registration {svort, svort-stack, stack, none} -> (svort, vvr,
    force_vvr) flags (reference cli/commands.py:171-176)."""
    svort = args.registration == "svort" or args.registration == "svort-stack"
    vvr = args.registration != "none"
    force_vvr = args.registration == "svort-stack"
    return svort_predict(data, args.svort_version, svort, vvr, force_vvr)
