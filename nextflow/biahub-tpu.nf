#!/usr/bin/env nextflow

nextflow.enable.dsl = 2

// ---------------------------------------------------------------------------
//  biahub-tpu timelapse reconstruction pipeline.
//
//  Orchestration layer owning the directory layout and step order
//  (flat-field -> deskew -> reconstruct -> virtual-stain -> assemble ->
//  track), mirroring the reference pipeline's contract (reference:
//  nextflow/mantis-v2.nf). The execution model differs deliberately: the
//  reference fans one Slurm task out per position, while biahub-tpu batches
//  every position's (t, c) volumes on the TPU from a single controller — so
//  each step here is ONE task per TPU host, sized from the RESOURCES line
//  the CLI emits in --init mode.
// ---------------------------------------------------------------------------

params.input = null
params.output = null
params.deskew_config = null
params.flat_field_config = null
params.reconstruct_config = null
params.virtual_stain_config = null
params.track_config = null
params.concatenate_config = null
params.biahub_project = null
// Multi-host TPU fan-out: N tasks per step, each a jax.distributed process
// owning a stripe of the work units (biahub_tpu/parallel/distributed.py).
params.tpu_hosts = 1
params.tpu_coordinator = null

include { dataset_name } from './modules/common'
include { flat_field_wf } from './modules/flat_field'
include { deskew_wf } from './modules/deskew'
include { reconstruct_wf } from './modules/reconstruct'
include { virtual_stain_wf } from './modules/virtual_stain'
include { tracking_wf } from './modules/tracking'
include { assemble_wf } from './modules/assembly'

def directory_layout() {
    return [
        flat_field    : '0-flatfield',
        deskew        : '1-deskew',
        reconstruct   : '2-reconstruct',
        virtual_stain : '3-virtual-stain',
        track         : '4-track',
        assemble      : '5-assemble',
    ]
}

workflow {
    if (!params.input)                error "Provide --input"
    if (!params.output)               error "Provide --output"
    if (!params.flat_field_config)    error "Provide --flat_field_config"
    if (!params.deskew_config)        error "Provide --deskew_config"
    if (!params.reconstruct_config)   error "Provide --reconstruct_config"
    if (!params.virtual_stain_config) error "Provide --virtual_stain_config"
    if (!params.track_config)         error "Provide --track_config"
    if (!params.concatenate_config)   error "Provide --concatenate_config"

    def ds     = dataset_name()
    def out    = params.output
    def layout = directory_layout()

    ff_output = "${out}/${layout.flat_field}/${ds}.zarr"
    ff_done = flat_field_wf(params.input, ff_output,
                            params.flat_field_config, Channel.value(true))

    deskew_output = "${out}/${layout.deskew}/${ds}.zarr"
    deskew_done = deskew_wf(ff_output, deskew_output,
                            params.deskew_config, ff_done.done)

    reconstruct_output = "${out}/${layout.reconstruct}/${ds}.zarr"
    reconstruct_done = reconstruct_wf(deskew_output, reconstruct_output,
                                      params.reconstruct_config, deskew_done.done)

    virtual_stain_output = "${out}/${layout.virtual_stain}/${ds}.zarr"
    virtual_stain_done = virtual_stain_wf(reconstruct_output,
                                          virtual_stain_output,
                                          params.virtual_stain_config,
                                          reconstruct_done.done)

    assemble_output = "${out}/${layout.assemble}/${ds}.zarr"
    assemble_done = assemble_wf(deskew_output, reconstruct_output,
                                virtual_stain_output, assemble_output,
                                params.concatenate_config,
                                virtual_stain_done.done)

    track_output = "${out}/${layout.track}/${ds}.zarr"
    tracking_wf(assemble_output, track_output,
                params.track_config, assemble_done.done)
}
