# psd.gnuplot : plot a single Bartlett PSD dump produced by
#     python -m sdr_tpu 0 1 --psd-dump demod_psd ...
# (mirrors the PSD pane of the reference's data/example.gnuplot)
#
# usage: gnuplot -e "datfile='demod_psd.dat'" -p psd.gnuplot

reset
if (!exists("datfile")) datfile = 'demod_psd.dat'

set grid xtics ytics
set grid lt 1 lc rgb '#cccccc' lw 1
set ylabel 'Spectrum (dB/Hz)'
set xlabel 'Frequency (KHz)'
set yrange [-90:0]
plot datfile using 1:2 with lines lt 1 lw 3 lc rgb '#880000' notitle
