// Assemble step: resolve the concatenate config's placeholder paths with the
// three upstream outputs, then run a single-shot concatenate (reference
// pattern: nextflow/modules/assembly.nf).

include { biahub_cmd } from './common'

process resolve_concat_config {
    label 'cpu_local'

    input:
    val deskew_zarr
    val reconstruct_zarr
    val virtual_stain_zarr
    val config
    val trigger

    output:
    path 'resolved_concat.yml'

    script:
    """
    ${biahub_cmd()} concatenate \
        -c "${config}" \
        -o resolved_concat.yml \
        --concat-data-paths "${deskew_zarr}/*/*/*" \
        --concat-data-paths "${reconstruct_zarr}/*/*/*" \
        --concat-data-paths "${virtual_stain_zarr}/*/*/*"
    """
}

process run_concatenate {
    label 'tpu'

    input:
    path resolved_config
    val output_zarr

    output:
    val 'done'

    script:
    """
    ${biahub_cmd()} concatenate --cluster debug --resume \
        -c "${resolved_config}" \
        -o "${output_zarr}"
    """
}

workflow assemble_wf {
    take:
    deskew_zarr
    reconstruct_zarr
    virtual_stain_zarr
    output_zarr
    config
    prev_done

    main:
    resolved = resolve_concat_config(deskew_zarr, reconstruct_zarr,
                                     virtual_stain_zarr, config,
                                     prev_done.map { 'done' })
    assemble_done = run_concatenate(resolved, output_zarr)

    emit:
    done = assemble_done
}
