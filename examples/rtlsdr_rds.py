"""RDS receiver on broadcast FM: prints decoded RDS packets as JSON.

TPU-native analog of /root/reference/examples/rtlsdr_rds.lua.
Run: ./luaradio-tpu examples/rtlsdr_rds.py
"""

import luaradio_tpu as radio

top = radio.CompositeBlock()
source = radio.RtlSdrSource(88.5e6 - 250e3, 1102500)
tuner = radio.TunerBlock(-250e3, 200e3, 4)
receiver = radio.RDSReceiver()
sink = radio.JSONSink()
top.connect(source, tuner, receiver, sink)

if __name__ == "__main__":
    top.run()
