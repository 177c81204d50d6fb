"""IQ file format converter (any of the 14 scalar wire formats).

TPU-native analog of /root/reference/examples/iqfile_converter.lua.
Run: ./luaradio-tpu examples/iqfile_converter.py \
         <in file> <in format> <out file> <out format>
"""

import sys

import luaradio_tpu as radio

if len(sys.argv) < 5:
    sys.exit(f"Usage: {sys.argv[0]} <in> <in fmt> <out> <out fmt>\n"
             f"Formats: u8, s8, u16le, u16be, s16le, s16be, u32le, u32be, "
             f"s32le, s32be, f32le, f32be, f64le, f64be")

top = radio.CompositeBlock()
top.connect(radio.IQFileSource(sys.argv[1], sys.argv[2], 1.0),
            radio.IQFileSink(sys.argv[3], sys.argv[4]))

if __name__ == "__main__":
    top.run()
