/*
 * luaradio_tpu embedding API for host C programs.
 *
 * TPU-native equivalent of the reference's C embedding API
 * (/root/reference/embed/luaradio.h:20-148): create a context, load a
 * Python flow-graph script that returns a CompositeBlock, and
 * start/wait/stop it.  The implementation embeds CPython (embed.c).
 */

#ifndef LUARADIO_TPU_H
#define LUARADIO_TPU_H

#ifdef __cplusplus
extern "C" {
#endif

typedef struct luaradio_tpu luaradio_tpu_t;

typedef struct {
    unsigned int running;
} luaradio_tpu_status_t;

/* Create a new context (initializes the embedded interpreter on first use).
 * Returns NULL on failure. */
luaradio_tpu_t *luaradio_tpu_new(void);

/* Load a flow-graph script.  The script must leave a CompositeBlock in a
 * variable named `top` (or return one from a `main()` function).
 * Returns 0 on success, -1 on failure. */
int luaradio_tpu_load(luaradio_tpu_t *radio, const char *script);

/* Start / wait-for / stop the loaded flow graph.  Return 0 on success. */
int luaradio_tpu_start(luaradio_tpu_t *radio);
int luaradio_tpu_wait(luaradio_tpu_t *radio);
int luaradio_tpu_stop(luaradio_tpu_t *radio);

/* Get run status.  Returns 0 on success. */
int luaradio_tpu_status(luaradio_tpu_t *radio, luaradio_tpu_status_t *status);

/* Free the context (stops the graph if running). */
void luaradio_tpu_free(luaradio_tpu_t *radio);

/* Last error message for this context ("" if none). */
const char *luaradio_tpu_strerror(luaradio_tpu_t *radio);

/* Version string of the framework. */
const char *luaradio_tpu_version(void);

#ifdef __cplusplus
}
#endif

#endif /* LUARADIO_TPU_H */
