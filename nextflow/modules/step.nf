// Generic biahub-tpu step: init (login node, emits RESOURCES) -> one batched
// run on a TPU host. The module is path-agnostic; the pipeline hands it
// explicit input/output zarr paths (reference pattern:
// nextflow/modules/deskew.nf, adapted to single-task-per-step execution).

def dataset_name() {
    return params.input ?
        new File(params.input).name.replaceAll(/(\.ome)?\.zarr$/, '') : null
}

def parse_resources(stdout_text, prefix = 'RESOURCES:') {
    def matching = stdout_text.trim().readLines().findAll { it.startsWith(prefix) }
    if (!matching) {
        error "Expected a '${prefix}' line in command output but none was found."
    }
    def payload = matching.last().replace(prefix, '').trim()
    def res = new groovy.json.JsonSlurper().parseText(payload)
    return [cpus: res.cpus as int, mem_gb: res.mem_gb as int,
            time_minutes: res.time_minutes as int]
}

def biahub_cmd() {
    return params.biahub_project ?
        "uv run --project ${params.biahub_project} biahub" : "biahub"
}

process init_step {
    label 'cpu_local'

    input:
    val step
    val input_zarr
    val output_zarr
    val config
    val trigger

    output:
    stdout

    script:
    """
    ${biahub_cmd()} ${step} --init \
        -i "${input_zarr}"/*/*/* \
        -o "${output_zarr}" \
        -c "${config}"
    """
}

process run_step {
    tag "${step}"
    label 'tpu'
    cpus { meta.cpus }
    memory { "${meta.mem_gb} GB" }
    time { "${meta.time_minutes * task.attempt} min" }

    input:
    val step
    val meta
    val input_zarr
    val output_zarr
    val config

    output:
    val 'done'

    script:
    // --resume keeps a preempted step's finished (t, c) units; --cluster debug
    // runs the batch executor synchronously so this single task owns the step.
    """
    ${biahub_cmd()} ${step} --cluster debug --resume \
        -i "${input_zarr}"/*/*/* \
        -o "${output_zarr}" \
        -c "${config}"
    """
}

workflow run_step_wf {
    take:
    step
    input_zarr
    output_zarr
    config
    prev_done

    main:
    init_out = init_step(step, input_zarr, output_zarr, config, prev_done.map { 'done' })
    meta = init_out.map { parse_resources(it) }
    step_done = run_step(step, meta, input_zarr, output_zarr, config)

    emit:
    done = step_done
}
