// Shared helpers for the biahub-tpu pipeline modules (reference pattern:
// nextflow/modules/common.nf).
//
// The RESOURCES contract: every biahub verb run with --init prints one
// 'RESOURCES:{json}' line whose payload carries integer cpus / mem_gb /
// time_minutes (biahub_tpu/runtime/resources.py::echo_resources). The
// Python-side test tests/test_nextflow_contract.py parses --init output with
// the exact semantics of parse_resources below — change them together.

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

// Multi-host fan-out: params.tpu_hosts tasks per step, each exporting the
// BIAHUB_TPU_* coordinates that bring up jax.distributed inside the CLI
// (biahub_tpu/parallel/distributed.py). With one host the exports resolve to
// a single-process runtime.
def tpu_env(host_id) {
    def n = params.tpu_hosts ?: 1
    def lines = ["export BIAHUB_TPU_NUM_PROCESSES=${n}",
                 "export BIAHUB_TPU_PROCESS_ID=${host_id}"]
    if (n > 1) {
        if (!params.tpu_coordinator) {
            error "Set --tpu_coordinator host:port when --tpu_hosts > 1"
        }
        lines << "export BIAHUB_TPU_COORDINATOR=${params.tpu_coordinator}"
    }
    return lines.join('\n    ')
}
