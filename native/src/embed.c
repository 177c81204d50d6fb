/*
 * C embedding API implementation over CPython.
 *
 * Mirrors the reference's embed/luaradio.c (which hosts a LuaJIT state and
 * drives CompositeBlock methods, :18-266); here the hosted runtime is
 * CPython + luaradio_tpu.  One interpreter serves all contexts (CPython
 * limitation); each context holds its own `top` flow graph object.
 */

#include <Python.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "../include/luaradio_tpu.h"

struct luaradio_tpu {
    PyObject *top;      /* CompositeBlock */
    char errmsg[1024];
};

static int g_python_started = 0;

static void set_error(luaradio_tpu_t *radio, const char *prefix) {
    PyObject *type = NULL, *value = NULL, *tb = NULL;
    PyErr_Fetch(&type, &value, &tb);
    const char *msg = "unknown error";
    PyObject *str = NULL;
    if (value != NULL) {
        str = PyObject_Str(value);
        if (str != NULL)
            msg = PyUnicode_AsUTF8(str);
    }
    snprintf(radio->errmsg, sizeof(radio->errmsg), "%s: %s", prefix, msg);
    Py_XDECREF(str);
    Py_XDECREF(type);
    Py_XDECREF(value);
    Py_XDECREF(tb);
}

luaradio_tpu_t *luaradio_tpu_new(void) {
    if (!g_python_started) {
        Py_InitializeEx(0);
        g_python_started = 1;
    }
    luaradio_tpu_t *radio = calloc(1, sizeof(*radio));
    return radio;
}

int luaradio_tpu_load(luaradio_tpu_t *radio, const char *script) {
    PyObject *globals = PyDict_New();
    if (globals == NULL)
        return -1;
    PyDict_SetItemString(globals, "__builtins__", PyEval_GetBuiltins());

    PyObject *result = PyRun_String(script, Py_file_input, globals, globals);
    if (result == NULL) {
        set_error(radio, "load");
        Py_DECREF(globals);
        return -1;
    }
    Py_DECREF(result);

    PyObject *top = PyDict_GetItemString(globals, "top"); /* borrowed */
    if (top == NULL) {
        snprintf(radio->errmsg, sizeof(radio->errmsg),
                 "load: script did not define a CompositeBlock named 'top'");
        Py_DECREF(globals);
        return -1;
    }
    Py_INCREF(top);
    Py_XDECREF(radio->top);
    radio->top = top;
    Py_DECREF(globals);
    return 0;
}

static int call_method(luaradio_tpu_t *radio, const char *name) {
    if (radio->top == NULL) {
        snprintf(radio->errmsg, sizeof(radio->errmsg),
                 "%s: no flow graph loaded", name);
        return -1;
    }
    PyObject *r = PyObject_CallMethod(radio->top, name, NULL);
    if (r == NULL) {
        set_error(radio, name);
        return -1;
    }
    Py_DECREF(r);
    return 0;
}

int luaradio_tpu_start(luaradio_tpu_t *radio) {
    return call_method(radio, "start");
}

int luaradio_tpu_wait(luaradio_tpu_t *radio) {
    return call_method(radio, "wait");
}

int luaradio_tpu_stop(luaradio_tpu_t *radio) {
    return call_method(radio, "stop");
}

int luaradio_tpu_status(luaradio_tpu_t *radio,
                        luaradio_tpu_status_t *status) {
    if (radio->top == NULL) {
        status->running = 0;
        return 0;
    }
    PyObject *st = PyObject_CallMethod(radio->top, "status", NULL);
    if (st == NULL) {
        set_error(radio, "status");
        return -1;
    }
    PyObject *running = PyDict_GetItemString(st, "running"); /* borrowed */
    status->running = (running != NULL && PyObject_IsTrue(running)) ? 1 : 0;
    Py_DECREF(st);
    return 0;
}

void luaradio_tpu_free(luaradio_tpu_t *radio) {
    if (radio == NULL)
        return;
    if (radio->top != NULL) {
        PyObject *r = PyObject_CallMethod(radio->top, "stop", NULL);
        if (r == NULL)
            PyErr_Clear();
        Py_XDECREF(r);
        Py_DECREF(radio->top);
    }
    free(radio);
}

const char *luaradio_tpu_strerror(luaradio_tpu_t *radio) {
    return radio->errmsg;
}

const char *luaradio_tpu_version(void) {
    return "0.1.0";
}
