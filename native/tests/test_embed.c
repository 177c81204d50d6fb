/*
 * C embedding API lifecycle test (analog of the reference's
 * embed/tests/test_api.c): build a flow graph from C, start it, poll
 * status, stop it.
 */

#include <assert.h>
#include <stdio.h>
#include <string.h>
#include <unistd.h>

#include "../include/luaradio_tpu.h"

static const char *script =
    "import sys\n"
    "sys.path.insert(0, '" REPO_ROOT "')\n"
    "import luaradio_tpu as radio\n"
    "top = radio.CompositeBlock()\n"
    "top.connect(radio.ZeroSource(radio.ComplexFloat32, 1e6),\n"
    "            radio.NopSink())\n";

int main(void) {
    printf("version: %s\n", luaradio_tpu_version());
    assert(strcmp(luaradio_tpu_version(), "0.1.0") == 0);

    luaradio_tpu_t *radio = luaradio_tpu_new();
    assert(radio != NULL);

    /* load failure surfaces an error */
    assert(luaradio_tpu_load(radio, "raise ValueError('nope')\n") == -1);
    assert(strstr(luaradio_tpu_strerror(radio), "nope") != NULL);

    /* load + lifecycle */
    if (luaradio_tpu_load(radio, script) != 0) {
        fprintf(stderr, "load: %s\n", luaradio_tpu_strerror(radio));
        return 1;
    }
    if (luaradio_tpu_start(radio) != 0) {
        fprintf(stderr, "start: %s\n", luaradio_tpu_strerror(radio));
        return 1;
    }

    luaradio_tpu_status_t status;
    assert(luaradio_tpu_status(radio, &status) == 0);
    printf("running: %u\n", status.running);
    assert(status.running == 1);

    usleep(200000);
    assert(luaradio_tpu_stop(radio) == 0);
    assert(luaradio_tpu_status(radio, &status) == 0);
    assert(status.running == 0);

    luaradio_tpu_free(radio);
    printf("embed API lifecycle OK\n");
    return 0;
}
