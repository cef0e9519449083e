# psd_anim.gnuplot : render an animated PSD series produced by
#     python -m sdr_tpu 0 1 --psd-anim demod_psd_anim ...
# into an animated GIF (the P6 animated-PSD view, reference
# model/fmMonoAnim.py + data/example.gnuplot conventions).
#
# usage: gnuplot -e "datfile='demod_psd_anim.dat'" psd_anim.gnuplot
#        (datfile defaults to demod_psd_anim.dat; output psd_anim.gif)

reset
if (!exists("datfile")) datfile = 'demod_psd_anim.dat'
if (!exists("outfile")) outfile = 'psd_anim.gif'

stats datfile nooutput
nframes = STATS_blocks

set terminal gif animate delay 8 size 900,420
set output outfile
set grid xtics ytics
set grid lt 1 lc rgb '#cccccc' lw 1
set ylabel 'Spectrum (dB/Hz)'
set xlabel 'Frequency (KHz)'
set yrange [-90:0]

do for [k=0:nframes-1] {
    plot datfile index k using 1:2 with lines lt 1 lw 2 lc rgb '#880000' \
        title sprintf('block %d', k)
}

unset output
