"""Command-line entry points: simulate / reconstruct / benchmark.

The reference has no CLI — each driver script hard-codes parameter dicts and
is edited by hand (ref tensorflow_recon/reconstruct_fullfield.py:271). Here
the same presets are exposed through argparse:

    python -m beyond_dof_tpu.cli simulate --preset adhesin --out adhesin.h5
    python -m beyond_dof_tpu.cli reconstruct --preset adhesin --data adhesin.h5
    python -m beyond_dof_tpu.cli reconstruct-ptycho --preset adhesin_ptycho ...
    python -m beyond_dof_tpu.cli benchmark --size 256 --n-slices 256
"""

import argparse
import json
import sys

import numpy as np


def _cmd_simulate(args):
    from .configs.presets import FULLFIELD_PRESETS, PTYCHO_PRESETS, make_phantom
    from .sim.acquire import (create_fullfield_data, create_ptychography_data,
                              add_poisson_noise_fullfield,
                              add_poisson_noise_ptycho)
    if args.ptycho:
        preset = PTYCHO_PRESETS[args.preset]
        gd, gb = make_phantom(preset["phantom"])
        sim = dict(preset["simulate"])
        n_ph = (sim.pop("n_photons_total", None)
                if args.n_photons is None else args.n_photons)
        if args.n_theta:
            sim["n_theta"] = args.n_theta
        data = create_ptychography_data(gd, gb, probe_pos=preset["probe_pos"],
                                        save_folder=".", fname=None, **sim)
        if n_ph:
            # the reference's photon-budget Poisson machinery
            # (ref create_noisy_data.py:20-89)
            n_sample_pixel = int(np.count_nonzero(gd > 1e-10))
            data, mean_snr = add_poisson_noise_ptycho(
                np.asarray(data), n_ph, n_sample_pixel, gd.shape)
            print("Average SNR is {}.".format(mean_snr))
        from .io.exchange import write_exchange_data
        write_exchange_data(args.out, data)
    else:
        preset = FULLFIELD_PRESETS[args.preset]
        gd, gb = make_phantom(preset["phantom"])
        sim = dict(preset["simulate"])
        n_ph = (sim.pop("n_photons_total", None)
                if args.n_photons is None else args.n_photons)
        if args.n_theta:
            sim["n_theta"] = args.n_theta
        data = create_fullfield_data(gd, gb, save_folder=".", fname=None, **sim)
        if n_ph:
            n_sample_pixel = int(np.count_nonzero(gd > 1e-10))
            data, mean_snr = add_poisson_noise_fullfield(data, n_ph, n_sample_pixel)
            print("Average SNR is {}.".format(mean_snr))
        from .io.exchange import write_exchange_data
        write_exchange_data(args.out, data)
    np.save(args.out + ".phantom_delta.npy", gd)
    np.save(args.out + ".phantom_beta.npy", gb)
    print("Wrote {} with shape {}".format(args.out, data.shape))


def _cmd_reconstruct(args):
    from .configs.presets import FULLFIELD_PRESETS
    from .recon.fullfield import reconstruct_fullfield
    preset = dict(FULLFIELD_PRESETS[args.preset]["reconstruct"])
    if args.n_epochs is not None:
        preset["n_epochs"] = args.n_epochs
    d, b, info = reconstruct_fullfield(fname=args.data, output_folder=args.out,
                                       **preset)
    print("Final loss: {}".format(info["loss"][-1]))
    print("Outputs in {}".format(info["output_folder"]))


def _cmd_reconstruct_ptycho(args):
    from .configs.presets import PTYCHO_PRESETS
    from .recon.ptycho import reconstruct_ptychography
    preset = PTYCHO_PRESETS[args.preset]
    rp = dict(preset["reconstruct"])
    if args.n_epochs is not None:
        rp["n_epochs"] = args.n_epochs
    d, b, info = reconstruct_ptychography(probe_pos=np.array(preset["probe_pos"]),
                                          fname=args.data, output_folder=args.out,
                                          minibatch_size=args.minibatch_size,
                                          **rp)
    print("Final loss: {}".format(info["loss"][-1]))


def _cmd_benchmark(args):
    from benchmarks.multislice_bench import run_benchmark
    result = run_benchmark(size=args.size, n_slices=args.n_slices,
                           batch=args.batch, n_iters=args.iters)
    print(json.dumps(result))


def _cmd_make_mask(args):
    """Bootstrap a finite-support mask: Paganin -> FBP -> threshold
    (replaces the reference's coarse_phase_retrival_and_recon.py +
    create_support_mask.py pipeline)."""
    from .io.exchange import read_exchange_data
    from .io import tiff
    from .ops.tomo import paganin_support_mask
    data = read_exchange_data(args.data)
    thetas = -np.linspace(args.theta_st, args.theta_end, data.shape[0])
    mask = np.asarray(paganin_support_mask(
        np.abs(data).astype(np.float32), thetas.astype(np.float32),
        args.psize_cm, args.dist_cm, args.energy_ev,
        delta_beta_ratio=args.delta_beta, threshold=args.threshold))
    out = tiff.write_tiff(mask, args.out)
    print("Wrote support mask {} (coverage {:.1%})".format(out, mask.mean()))


def _cmd_baseline(args):
    """Classical baseline reconstruction (FBP or SIRT) from attenuation data
    (replaces the reference's sirt_tomopy.py driver)."""
    from .io.exchange import read_exchange_data
    from .io import tiff
    from .ops.tomo import fbp, sirt
    from .ops.image import preprocess
    data = read_exchange_data(args.data)
    prj = preprocess(np.abs(data).astype(np.float64)).astype(np.float32)
    thetas = -np.linspace(args.theta_st, args.theta_end,
                          prj.shape[0]).astype(np.float32)
    if args.algorithm == "sirt":
        rec = np.asarray(sirt(prj, thetas, n_iter=args.n_iter))
    else:
        rec = np.asarray(fbp(prj, thetas))
    out = tiff.write_tiff(rec, args.out)
    print("Wrote {} reconstruction {} shape {}".format(args.algorithm, out,
                                                       rec.shape))


def _cmd_dump(args):
    """Dump an exchange H5 to TIFF magnitude/phase stacks
    (replaces the reference's dump_diffraction_data.py:6-9)."""
    from .utils.plots import dump_diffraction_data
    dest = dump_diffraction_data(args.data, dest_folder=args.out)
    print("Wrote mag/phase stacks in {}".format(dest))


def _cmd_fsc(args):
    """FSC/FRC of a reconstruction vs the phantom, with the 1/2-bit
    criterion curve (replaces the reference's plot_fsc.py:11-14)."""
    from .io import tiff
    from .utils.plots import plot_fsc

    def load(path):
        if path.endswith(".npy"):
            return np.load(path)
        return tiff.read_tiff(path)

    obj, ref = load(args.recon), load(args.reference)
    radii, curve = plot_fsc(obj, ref, save_path=args.out, ring=args.ring)
    print("Wrote {} ({} shells, FSC[0]={:.3f})".format(
        args.out, len(radii), float(curve[0])))


def main(argv=None):
    p = argparse.ArgumentParser(prog="beyond_dof_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("simulate", help="generate a dataset from a preset")
    ps.add_argument("--preset", required=True)
    ps.add_argument("--out", required=True)
    ps.add_argument("--ptycho", action="store_true")
    ps.add_argument("--n-theta", type=int, default=None)
    ps.add_argument("--n-photons", type=float, default=None,
                    help="total-photon Poisson budget (ref create_noisy_data"
                         ".py:20-89); overrides the preset; 0 = noiseless")
    ps.set_defaults(fn=_cmd_simulate)

    pr = sub.add_parser("reconstruct", help="full-field reconstruction")
    pr.add_argument("--preset", required=True)
    pr.add_argument("--data", required=True)
    pr.add_argument("--out", default=None)
    pr.add_argument("--n-epochs", type=int, default=None)
    pr.set_defaults(fn=_cmd_reconstruct)

    pp = sub.add_parser("reconstruct-ptycho", help="ptychographic reconstruction")
    pp.add_argument("--preset", required=True)
    pp.add_argument("--data", required=True)
    pp.add_argument("--out", default=None)
    pp.add_argument("--n-epochs", type=int, default=None)
    pp.add_argument("--minibatch-size", type=int, default=None)
    pp.set_defaults(fn=_cmd_reconstruct_ptycho)

    pb = sub.add_parser("benchmark", help="multislice throughput benchmark")
    pb.add_argument("--size", type=int, default=256)
    pb.add_argument("--n-slices", type=int, default=256)
    pb.add_argument("--batch", type=int, default=1)
    pb.add_argument("--iters", type=int, default=10)
    pb.set_defaults(fn=_cmd_benchmark)

    pm = sub.add_parser("make-mask", help="Paganin+FBP finite-support mask")
    pm.add_argument("--data", required=True)
    pm.add_argument("--out", default="fin_sup_mask/mask")
    pm.add_argument("--energy-ev", type=float, default=5000)
    pm.add_argument("--psize-cm", type=float, default=1e-7)
    pm.add_argument("--dist-cm", type=float, default=1e-4)
    pm.add_argument("--delta-beta", type=float, default=1e3)
    pm.add_argument("--threshold", type=float, default=1e-1)
    pm.add_argument("--theta-st", type=float, default=0.0)
    pm.add_argument("--theta-end", type=float, default=2 * np.pi)
    pm.set_defaults(fn=_cmd_make_mask)

    pc = sub.add_parser("baseline", help="classical FBP/SIRT reconstruction")
    pc.add_argument("--data", required=True)
    pc.add_argument("--out", default="baseline_recon")
    pc.add_argument("--algorithm", choices=["fbp", "sirt"], default="fbp")
    pc.add_argument("--n-iter", type=int, default=30)
    pc.add_argument("--theta-st", type=float, default=0.0)
    pc.add_argument("--theta-end", type=float, default=2 * np.pi)
    pc.set_defaults(fn=_cmd_baseline)

    pd = sub.add_parser("dump", help="H5 -> TIFF magnitude/phase stacks")
    pd.add_argument("--data", required=True)
    pd.add_argument("--out", default="raw_data")
    pd.set_defaults(fn=_cmd_dump)

    pf = sub.add_parser("fsc", help="FSC curve of recon vs phantom")
    pf.add_argument("--recon", required=True,
                    help=".npy or .tiff reconstruction volume")
    pf.add_argument("--reference", required=True,
                    help=".npy or .tiff ground-truth volume")
    pf.add_argument("--out", default="fsc")
    pf.add_argument("--ring", action="store_true",
                    help="2-D FRC instead of 3-D FSC")
    pf.set_defaults(fn=_cmd_fsc)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
