// virtual-stain step: init (login node, emits RESOURCES) -> one batched run per
// TPU host (reference pattern: nextflow/modules/virtual_stain.nf, adapted from
// per-position Slurm fan-out to per-host batched execution).

include { parse_resources; biahub_cmd; tpu_env } from './common'

process init_virtual_stain {
    label 'cpu_local'

    input:
    val input_zarr
    val output_zarr
    val config
    val trigger

    output:
    stdout

    script:
    """
    ${biahub_cmd()} virtual-stain --init \
        -i "${input_zarr}"/*/*/* \
        -o "${output_zarr}" \
        -c "${config}"
    """
}

process run_virtual_stain {
    tag "host${host_id}"
    label 'tpu'
    cpus { meta.cpus }
    memory { "${meta.mem_gb} GB" }
    time { "${meta.time_minutes * task.attempt} min" }

    input:
    tuple val(host_id), val(meta)
    val input_zarr
    val output_zarr
    val config

    output:
    val host_id

    script:
    // --resume keeps a preempted host's finished (t, c) units; each host owns
    // a deterministic stripe of the work units (BatchRunner striping).
    """
    ${tpu_env(host_id)}
    ${biahub_cmd()} virtual-stain --cluster debug --resume \
        -i "${input_zarr}"/*/*/* \
        -o "${output_zarr}" \
        -c "${config}"
    """
}

workflow virtual_stain_wf {
    take:
    input_zarr
    output_zarr
    config
    prev_done

    main:
    init_out = init_virtual_stain(input_zarr, output_zarr, config, prev_done.map { 'done' })
    meta = init_out.map { parse_resources(it) }
    hosts = Channel.of(0..<((params.tpu_hosts ?: 1) as int))
    step_done = run_virtual_stain(hosts.combine(meta), input_zarr, output_zarr, config) | collect

    emit:
    done = step_done
}
