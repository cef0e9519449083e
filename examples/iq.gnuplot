# iq.gnuplot : render the time-domain I/Q stage traces produced by
#     python -m sdr_tpu 0 1 --trace-iq trace --in capture.raw ...
# (mirrors the reference's data/iq.gnuplot + data/iq_filt.gnuplot panes,
#  fed by logVector dumps — src/logfunc.cpp:23-43)
#
# usage: gnuplot -e "base='trace'" -p examples/iq.gnuplot

reset
if (!exists("base")) base = 'trace'

set size ratio 0.2
set grid xtics ytics
set grid lt 1 lc rgb '#cccccc' lw 1
set multiplot layout 4,1 scale 1.0,1.0

set ylabel 'I (raw)'
set xlabel 'Sample #'
set xrange [0:511]
plot base.'_i_time.dat' using 1:2 with lines lt 1 lw 2 lc rgb '#000088' notitle

set ylabel 'Q (raw)'
plot base.'_q_time.dat' using 1:2 with lines lt 1 lw 2 lc rgb '#008800' notitle

set ylabel 'I (filtered)'
plot base.'_i_filt_time.dat' using 1:2 with lines lt 1 lw 2 lc rgb '#880000' notitle

set ylabel 'Q (filtered)'
plot base.'_q_filt_time.dat' using 1:2 with lines lt 1 lw 2 lc rgb '#888800' notitle

unset multiplot
